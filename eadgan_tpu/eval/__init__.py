"""Disentanglement evaluation suite (layer L6).

Six metrics x two dataset variants, replacing the twelve reference
scripts under ``dSprites/score/`` and ``colored_dSprites/score/``:
BetaVAE, FactorVAE, MIG, SAP, DCI, F-statistic
(modularity/explicitness).  Encoders run batched on device; the
classical-statistics heads (LogisticRegression, LinearSVC, Lasso,
RandomForest) stay on the host via sklearn — same split as the
reference.
"""

from eadgan_tpu.eval.data import make_metric_data
from eadgan_tpu.eval.representation import Representer
from eadgan_tpu.eval.metrics import (
    betavae_score,
    dci_score,
    factorvae_score,
    fstat_score,
    mig_score,
    sap_score,
)

__all__ = [
    "make_metric_data",
    "Representer",
    "betavae_score",
    "factorvae_score",
    "mig_score",
    "sap_score",
    "dci_score",
    "fstat_score",
]
