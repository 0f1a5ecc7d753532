"""BPE tokenizer: trainer golden, encoder invariants, packaged-vocab
reproducibility, and Spark-UDF parity against the pure-Python encoder
(q_bpe_token_count / q_sequence_packing_bpe are rows-only in the driver,
so the numeric verification lives here)."""

from __future__ import annotations

import os
import re

import pandas as pd
import pytest

from tests.conftest import SF_SMALL
from unmixing_spark.queries import registry
from unmixing_spark.text.bpe import (
    BPETokenizer,
    load_default,
    load_merges,
    pretokenize,
    train_bpe,
)


def _docs():
    return pd.read_parquet(f"{SF_SMALL}/documents.parquet")


# ---- pure-Python algorithm --------------------------------------------------

def test_pretokenize_lossless():
    for text in ["the fast  key\torder\nsort", "a 42 don't x!!  ",
                 "hash-join: 3.14% (ok)"]:
        assert "".join(pretokenize(text)) == text


def test_trainer_golden():
    # Sennrich 2016 worked-example shape: most-frequent pair merges first,
    # ties break on the lexicographically smaller pair.
    corpus = ["low low low lower lowest", "new newer newest"]
    merges = train_bpe(corpus, 4)
    # (l,o)/(o,w) tie at 5 -> lexicographic; then (lo,w)=5; then the
    # 4-count tie (' ',low)/(e,w)/(n,e) -> space sorts first; then (e,w).
    assert merges == [("l", "o"), ("lo", "w"), (" ", "low"), ("e", "w")], merges


def test_trainer_stops_at_saturation():
    merges = train_bpe(["ab ab ab"], 100)
    # "ab" and " ab" fully merge, then no pair repeats
    tok = BPETokenizer(merges)
    assert tok.encode("ab ab ab") == ["ab", " ab", " ab"]
    assert len(merges) < 100


def test_encoder_invariants():
    tok = load_default()
    for text in [t for t in _docs()["text"].head(40)] + ["", "  ", "zzz qqq"]:
        toks = tok.encode(text)
        assert "".join(toks) == text            # lossless
        assert tok.count_tokens(text) == len(toks)
        # every token is either a learned merge product or a single char
        vocab = {a + b for a, b in tok.merges}
        assert all(t in vocab or len(t) == 1 for t in toks)


def test_packaged_vocab_reproducible():
    # scripts/train_bpe_vocab.py regenerates bpe_merges.txt byte-for-byte
    texts = list(_docs().sort_values("doc_id")["text"])
    assert train_bpe(texts, 40) == load_merges()


def test_packaged_vocab_golden_encoding():
    tok = load_default()
    assert tok.encode("the fast key order") == [
        "t", "h", "e", " f", "as", "t", " ", "k", "e", "y", " order"]
    # subword regime, not word-memorization: mean tokens/word well above 1
    text = _docs()["text"].iloc[0]
    assert tok.count_tokens(text) > 2 * len(pretokenize(text))


# ---- Spark parity -----------------------------------------------------------

def test_bpe_token_count_matches_pure_python(spark):
    out = (registry()["q_bpe_token_count"].spark_fn(spark, SF_SMALL)
           .toPandas().set_index("doc_id").sort_index())
    docs = _docs()
    tok = load_default()
    assert len(out) == len(docs)
    for _, row in docs.iterrows():
        got = out.loc[row["doc_id"]]
        assert int(got["bpe_tokens"]) == tok.count_tokens(row["text"])
        assert int(got["ws_tokens"]) == len(re.split(r"\s+", row["text"]))


def test_sequence_packing_bpe_matches_pure_python(spark):
    from unmixing_spark.queries.text_q import PACK_BUDGET

    out = (registry()["q_sequence_packing_bpe"].spark_fn(spark, SF_SMALL)
           .toPandas().set_index("doc_id").sort_index())
    docs = _docs()
    tok = load_default()
    cum: dict[str, int] = {}
    for _, row in docs.sort_values("doc_id").iterrows():
        n = tok.count_tokens(row["text"])
        prefix = cum.get(row["lang"], 0)
        cum[row["lang"]] = prefix + n
        got = out.loc[row["doc_id"]]
        assert int(got["tokens"]) == n
        assert int(got["seq_id"]) == prefix // PACK_BUDGET
        assert int(got["seq_offset"]) == prefix % PACK_BUDGET
        assert int(got["boundary_crossings"]) == (
            (prefix + n) // PACK_BUDGET - prefix // PACK_BUDGET)


def test_bpe_train_distributed_matches_pure_python(spark):
    from unmixing_spark.queries.text_q import BPE_TRAIN_MERGES

    out = (registry()["q_bpe_train"].spark_fn(spark, SF_SMALL)
           .toPandas().sort_values("rank").reset_index(drop=True))
    docs = _docs().sort_values("doc_id")
    texts = list(docs["text"])

    # independent brute force WITH counts: replay Sennrich Algorithm 1
    # capturing the argmax count each round (train_bpe returns pairs only)
    freq: dict[tuple[str, ...], int] = {}
    for text in texts:
        for w in pretokenize(text):
            t = tuple(w)
            freq[t] = freq.get(t, 0) + 1
    expect: list[tuple[int, str, str, str, int]] = []
    for rank in range(BPE_TRAIN_MERGES):
        counts: dict[tuple[str, str], int] = {}
        for word, n in freq.items():
            for p in zip(word, word[1:]):
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (l, r), cnt = best
        expect.append((rank, l, r, l + r, cnt))
        new_freq: dict[tuple[str, ...], int] = {}
        for word, n in freq.items():
            out_syms, i = [], 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == l and word[i + 1] == r:
                    out_syms.append(l + r)
                    i += 2
                else:
                    out_syms.append(word[i])
                    i += 1
            t = tuple(out_syms)
            new_freq[t] = new_freq.get(t, 0) + n
        freq = new_freq

    got = [(int(r["rank"]), r["left"], r["right"], r["merged"],
            int(r["pair_count"])) for _, r in out.iterrows()]
    assert got == expect
    # the same corpus trained the packaged table: prefixes must agree
    # (train_bpe itself is the third way; both must say the same merges)
    assert [(g[1], g[2]) for g in got] == [
        tuple(p) for p in load_merges()[:len(got)]]
    assert [(g[1], g[2]) for g in got] == train_bpe(texts, len(got))
