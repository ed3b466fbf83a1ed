"""Objectives (layer L4): adversarial, info, and consistency losses.

Parity notes:

* MNIST uses LSGAN (MSE) adversarial loss (MNIST/EAD-GAN_rpqmnxy.py:195),
  dSprites/colored/CelebA use BCE on sigmoid outputs (dSprites/rp.py:251,
  celebA/EAD-GAN_celebA.py:161).
* The MNIST categorical info loss feeds the encoder's *softmax output*
  into torch CrossEntropyLoss — which applies log_softmax again
  (MNIST/EAD-GAN_rpqmnxy.py:161,427).  The double-softmax quirk is
  preserved by :func:`torch_cross_entropy` taking whatever the model
  head emits.
* ``mutual_info_loss`` (dSprites/rp.py:225-232) is conditional entropy +
  target entropy with eps=1e-8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "mse_loss",
    "bce_loss",
    "torch_cross_entropy",
    "mutual_info_loss",
]

_BCE_EPS = 1.1920929e-07  # f32 machine epsilon


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.MSELoss (mean reduction)."""
    return jnp.mean((pred - target) ** 2)


def bce_loss(pred_prob: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.BCELoss on probabilities.

    Probabilities are clipped into [eps, 1-eps] before the logs.  A
    clamp on the log value alone (torch clamps at -100) is NOT enough
    under jax autodiff: when a sigmoid saturates to exactly 0/1 the
    unselected log branch is -inf and the masked gradient evaluates
    0 * inf = NaN, killing the run (observed in a colored GAN soak at
    step 644 — torch survives because BCELoss guards its *backward*
    with an eps denominator).  Clipping matches torch's values
    everywhere p >= eps and bounds the gradient at 1/eps, mirroring
    torch's guarded backward.
    """
    p = jnp.clip(pred_prob, _BCE_EPS, 1.0 - _BCE_EPS)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log1p(-p))


def torch_cross_entropy(x: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.CrossEntropyLoss(x, labels): log_softmax over ``x`` then
    NLL of integer ``labels``, mean reduction.  ``x`` may be logits or —
    as the MNIST reference feeds it — already-softmaxed probabilities."""
    log_probs = jax.nn.log_softmax(x, axis=-1)
    picked = jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    return -jnp.mean(picked)


def mutual_info_loss(c_given_x: jnp.ndarray, c: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Categorical mutual-information surrogate (dSprites/rp.py:225-232):
    E[-sum(log(c|x + eps) * c)] + E[-sum(log(c + eps) * c)]."""
    conditional_entropy = jnp.mean(-jnp.sum(jnp.log(c_given_x + eps) * c, axis=-1))
    entropy = jnp.mean(-jnp.sum(jnp.log(c + eps) * c, axis=-1))
    return conditional_entropy + entropy
