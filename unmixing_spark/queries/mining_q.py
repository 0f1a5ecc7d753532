"""Embedding-mining operators over the embeddings table — the two
candidate-selection passes an embedding-driven training pipeline runs
after similarity search itself works.

- q_bitext_margin — ratio-margin bitext mining (Artetxe & Schwenk 2019,
  "Margin-based Parallel Corpus Mining with Multilingual Sentence
  Embeddings"; the CCMatrix/CCAligned candidate scorer): the corpus is
  split into two deterministic "language" sides by vec_id parity; each
  side-A vector's best side-B neighbor is scored by cos(x, y) normalized
  by the mean of both endpoints' k-NN cosine mass, and pairs above the
  margin threshold are the mined bitext candidates, with the mutual-best
  (forward winner is also the reverse winner) pairs flagged — the
  highest-precision tier every aligner keeps first.
- q_hard_negatives — contrastive-training hard-negative mining: for each
  anchor, the top-k most-cosine-similar vectors carrying a DIFFERENT
  label (the embeddings table's label column) — the standard dense-
  retriever negative sampler (DPR, Karpukhin et al. 2020 §4.2).

Scale notes: the brute-force side×side / anchor×corpus scoring here
prices the REGISTRY shape (500 vectors at sf0.01; the anchor set is
additionally bounded to N_ANCHORS). At corpus scale both operators swap
the theta-join for the engine's bucketed candidate generators (sign-LSH
q_ann_lsh_topk / IVF q_ann_ivf_topk, text/similarity.py) and compute
margins over candidates only — exactly how CCMatrix runs FAISS shards;
the margin/negative arithmetic downstream of candidate generation is
UNCHANGED, which is why the brute-force rendering is the right oracle.
The reference engine has no vector surface (SURVEY.md §2 "beyond the
reference"); this family is the training-data-pipeline brief.

Bit-parity: cosines are double dot products (Spark aggregate/zip_with
left fold; DuckDB list_dot_product) — the q_ann_cosine_topk pattern —
and every emitted float rounds to 6 decimals in BOTH renderings; ranking
ties break on vec_id. Thresholds/averages divide via D.dbl literals so
neither engine routes through DECIMAL.
"""

from __future__ import annotations

from unmixing_spark import dialect as D
from unmixing_spark.queries import sql_template
from unmixing_spark.queries.text_q import _dot

MARGIN_K = 4        # k-NN mass in the margin denominator (A&S use k=4)
MARGIN_MIN = 1.05   # ratio-margin keep threshold (~70% of forward-best
                    # pairs on the synthetic embeddings; A&S tune ~1.06)
N_ANCHORS = 8       # hard-negative anchors (bounded registry shape)
K_NEG = 5           # negatives mined per anchor


def _cos(d: str, a: str, b: str) -> str:
    dot = _dot(d, f"{a}.embedding", f"{b}.embedding")
    na = _dot(d, f"{a}.embedding", f"{a}.embedding")
    nb = _dot(d, f"{b}.embedding", f"{b}.embedding")
    return f"({dot}) / nullif(sqrt({na}) * sqrt({nb}), 0)"


def _bitext_margin(d: str) -> str:
    # The k-NN means are WINDOWED conditional averages over the ranked
    # pair stream, not GROUP BY + re-join: each CTE is then referenced
    # exactly once, so Catalyst's inlining costs nothing — the executed
    # plan scores the theta-join ONCE, and the forward-rank / forward-avg
    # windows share one src_id exchange (rn_r/avg_r share the dst_id
    # exchange likewise). The first GROUP BY draft re-ran the scoring
    # join three times through CTE inlining.
    k, half, thr = MARGIN_K, D.dbl(2.0), D.dbl(MARGIN_MIN)
    margin = f"cos / nullif((avg_f + avg_r) / {half}, 0)"
    return f"""
    WITH scored AS (
      SELECT a.vec_id AS src_id, b.vec_id AS dst_id, {_cos(d, 'a', 'b')} AS cos
      FROM embeddings a JOIN embeddings b
        ON a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
    ),
    fwd AS (
      SELECT src_id, dst_id, cos,
             row_number() OVER (PARTITION BY src_id
                                ORDER BY cos DESC, dst_id) AS rn_f
      FROM scored
    ),
    fwd_avg AS (
      SELECT src_id, dst_id, cos, rn_f,
             round(avg(CASE WHEN rn_f <= {k} THEN cos END)
                   OVER (PARTITION BY src_id), 9) AS avg_f
      FROM fwd
    ),
    rev AS (
      SELECT src_id, dst_id, cos, rn_f, avg_f,
             row_number() OVER (PARTITION BY dst_id
                                ORDER BY cos DESC, src_id) AS rn_r
      FROM fwd_avg
    ),
    aug AS (
      SELECT src_id, dst_id, cos, rn_f, rn_r, avg_f,
             round(avg(CASE WHEN rn_r <= {k} THEN cos END)
                   OVER (PARTITION BY dst_id), 9) AS avg_r
      FROM rev
    )
    SELECT src_id, dst_id,
           round(cos, 6)       AS cos,
           round({margin}, 6)  AS margin,
           cast(CASE WHEN rn_r = 1 THEN 1 ELSE 0 END as int) AS mutual_best
    FROM aug
    WHERE rn_f = 1 AND {margin} > {thr}
    """


sql_template("q_bitext_margin", _bitext_margin,
             "ratio-margin bitext mining (Artetxe & Schwenk 2019): "
             "forward-best cross-side pairs kept by k-NN-normalized "
             "cosine margin, mutual-best flagged",
             tables=("embeddings",))


def _hard_negatives(d: str) -> str:
    return f"""
    WITH scored AS (
      SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
             c.vec_id AS neg_id, c.label AS neg_label,
             {_cos(d, 'a', 'c')} AS cos
      FROM embeddings a JOIN embeddings c
        ON c.vec_id != a.vec_id AND c.label != a.label
      WHERE a.vec_id < {N_ANCHORS}
    ),
    ranked AS (
      SELECT anchor_id, anchor_label, neg_id, neg_label, cos,
             row_number() OVER (PARTITION BY anchor_id
                                ORDER BY cos DESC, neg_id) AS rn
      FROM scored
    )
    SELECT anchor_id, anchor_label, neg_id, neg_label,
           round(cos, 6) AS cos, rn
    FROM ranked WHERE rn <= {K_NEG}
    """


sql_template("q_hard_negatives", _hard_negatives,
             "hard-negative mining for contrastive training: top-k "
             "cosine-nearest different-label vectors per anchor (DPR "
             "negative sampler)",
             tables=("embeddings",))
