"""EAD-GAN TPU: a TPU-native (JAX/XLA/Pallas) framework for
Explicit-Affine-Disentangled GANs.

Re-designed from scratch for TPU hardware with the capabilities of the
reference EAD-GAN implementation (letao1991/EAD-GAN): four dataset
pipelines (MNIST, dSprites, colored-dSprites, CelebA), explicit affine /
color transformation regularizers, spatial-transformer warps, and a
six-metric disentanglement evaluation suite.

Layer map (mirrors SURVEY.md section 1, rebuilt TPU-first):
    transforms/  latent code <-> affine parameter <-> matrix algebra (L1)
    ops/         STN warp, spectral norm, batched affine inverse (L2/N*)
    models/      generator / discriminator / encoder zoo (L3)
    losses/      adversarial + info + affine-consistency objectives (L4)
    train/       jitted multi-phase train steps, train state, checkpoints (L5)
    parallel/    Mesh / NamedSharding data-parallel scaling (green-field)
    data/        host-side ingest pipelines feeding the device (L7)
    sample/      image-grid artifact rendering (L8)
    eval/        six disentanglement metrics (L6)
    cli/         entry points mirroring the reference commands
"""

__version__ = "0.1.0"
