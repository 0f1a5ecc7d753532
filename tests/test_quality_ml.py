"""q_quality_classifier: LR distillation of the Gopher rule conjunction
over hashed-bigram counts. rows-only in the driver contract, so the
numeric verification lives here: held-out accuracy/AUC floors (measured
0.948 / 0.987 vs a 0.532 base rate at sf0.001 — floors leave headroom
for partitioning-order jitter in the L-BFGS fit), label fidelity against
the registered q_gopher_quality query, and score sanity."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_SMALL
from unmixing_spark.queries import registry


def test_quality_classifier_distills_gopher_rules(spark):
    out = (registry()["q_quality_classifier"].spark_fn(spark, SF_SMALL)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    gq = (registry()["q_gopher_quality"].spark_fn(spark, SF_SMALL)
          .toPandas().sort_values("doc_id").reset_index(drop=True))
    # labels are exactly the Gopher keep flags; the split covers all docs
    assert len(out) == len(gq)
    assert (out["label"].to_numpy() == gq["keep"].to_numpy()).all()
    assert set(out["is_train"]) == {0, 1}
    assert out["p_keep"].between(0.0, 1.0).all()
    assert ((out["predicted"] == 1) == (out["p_keep"] > 0.5)).all()

    ho = out[out["is_train"] == 0]
    base = max(ho["label"].mean(), 1 - ho["label"].mean())
    acc = (ho["label"] == ho["predicted"]).mean()
    assert acc >= max(base + 0.1, 0.85), (acc, base)
    pos = ho.loc[ho["label"] == 1, "p_keep"].to_numpy()
    neg = ho.loc[ho["label"] == 0, "p_keep"].to_numpy()
    auc = float(np.mean([(np.sum(p > neg) + 0.5 * np.sum(p == neg))
                         / len(neg) for p in pos]))
    assert auc >= 0.9, auc
    # score separation: kept docs score higher on average
    assert pos.mean() > neg.mean() + 0.2
