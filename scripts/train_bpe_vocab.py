#!/usr/bin/env python
"""Train the packaged BPE merge table (unmixing_spark/text/bpe_merges.json).

Deterministic: reads the sf0.001 documents corpus in doc_id order and runs
the Sennrich 2016 trainer with lexicographic tie-breaking — re-running
reproduces the file byte-for-byte. Default 40 merges: the synthetic
vocabulary (61 distinct pre-tokens) saturates at 127, where every word
becomes one token; 40 keeps genuine subword splits (mean ~3.2
tokens/word, frequent words fully merged, rare ones split).

Usage: python scripts/train_bpe_vocab.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from unmixing_spark.text.bpe import save_merges, train_bpe  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    texts = [t for (t,) in duckdb.connect().execute(
        f"SELECT text FROM '{sf}/documents.parquet' ORDER BY doc_id"
    ).fetchall()]
    merges = train_bpe(texts, n_merges)
    save_merges(merges)
    print(f"{len(merges)} merges from {len(texts)} docs -> "
          "unmixing_spark/text/bpe_merges.json")


if __name__ == "__main__":
    main()
