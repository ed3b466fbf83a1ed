"""Metric tests against hand-built representations with known scores
(SURVEY.md section 4 test strategy): a perfectly disentangled
representation must score near the ceiling, a scrambled one near the
floor, for each metric.
"""

import numpy as np
import pytest

from eadgan_tpu.eval.metrics import (
    betavae_score,
    dci_score,
    factorvae_score,
    fstat_score,
    mig_score,
    sap_score,
)

N_FACTORS = 5  # shape, scale, angle, px, py (color dropped)


def perfect_representer(factors_as_imgs):
    """The 'images' in these tests are the (B, 5) ground-truth factors;
    a perfect encoder returns exactly them (plus tiny noise so stds are
    nonzero)."""
    rng = np.random.default_rng(0)
    f = np.asarray(factors_as_imgs, np.float64)
    return f + 1e-4 * rng.standard_normal(f.shape)


def scrambled_representer(factors_as_imgs):
    """Every code is a dense random mixture of all factors — poor
    disentanglement (full-rank mixing, so DCI can't collapse onto a
    single code)."""
    rng = np.random.default_rng(1)
    f = np.asarray(factors_as_imgs, np.float64)
    mix_rng = np.random.default_rng(42)
    mix = 0.5 + mix_rng.random((N_FACTORS, N_FACTORS))
    return f @ mix + 0.01 * rng.standard_normal(f.shape)


def _sample_factors(rng, n):
    sizes = [3, 6, 8, 8, 8]
    return np.stack(
        [rng.integers(0, s, n).astype(np.float64) for s in sizes], axis=1
    )


@pytest.fixture
def metric_data(rng):
    groups = []
    for i in range(60):
        fixed = i % N_FACTORS
        factors = _sample_factors(rng, 100)
        factors[:, fixed] = factors[0, fixed]
        groups.append({"img": factors, "label": fixed})
    eval_factors = _sample_factors(rng, 1000)
    ids = _sample_factors(rng, 1000).astype(np.int64)
    return {
        "groups": groups,
        "img_eval_std": eval_factors,
        "img_with_latent": {
            "img": ids.astype(np.float64),
            "latent": ids.astype(np.float64),
            "latent_id": ids,
            "is_continuous": [False, True, True, True, True],
        },
    }


def test_betavae_discriminates(metric_data):
    good = betavae_score(metric_data, perfect_representer)["betaVAE_metric"]
    bad = betavae_score(metric_data, scrambled_representer)["betaVAE_metric"]
    assert good > 0.95
    assert good > bad


def test_factorvae_discriminates(metric_data):
    good = factorvae_score(metric_data, perfect_representer)["factorVAE_metric"]
    bad = factorvae_score(metric_data, scrambled_representer)["factorVAE_metric"]
    assert good > 0.95
    assert good > bad


def test_mig_discriminates(rng):
    factors = _sample_factors(rng, 4000)
    good = mig_score(factors, factors, perfect_representer, num_points=1000, rng=rng)[
        "MIG_metric"
    ]
    bad = mig_score(factors, factors, scrambled_representer, num_points=1000, rng=rng)[
        "MIG_metric"
    ]
    assert good > 0.5
    assert good > bad + 0.2


def test_sap_discriminates(metric_data):
    good = sap_score(metric_data, perfect_representer)["SAP_metric"]
    bad = sap_score(metric_data, scrambled_representer)["SAP_metric"]
    assert good > 0.5
    assert good > bad


def test_dci_discriminates(metric_data):
    good = dci_score(metric_data, perfect_representer)["DCI_Lasso_disent_metric"]
    bad = dci_score(metric_data, scrambled_representer)["DCI_Lasso_disent_metric"]
    assert good > 0.9
    assert good > bad + 0.3


def test_fstat_discriminates(metric_data):
    good = fstat_score(metric_data, perfect_representer)
    bad = fstat_score(metric_data, scrambled_representer)
    assert good["FStat_modu_metric"] > 0.9
    assert good["FStat_modu_metric"] > bad["FStat_modu_metric"]
    assert good["FStat_expl_metric"] > 0.9
