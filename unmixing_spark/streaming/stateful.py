"""Custom stateful streaming operator: first-seen URL dedup.

The task brief names ``applyInPandasWithState`` as the extension point for
custom stateful operators; the canonical web-pipeline use is streaming
dedup — emit a page only the first time its url is seen, keeping seen-keys
in grouped state. State is keyed by a url hash prefix (bounded key space,
tunable cardinality vs state size), values are per-group sets of seen url
digests.

At 10^12 urls the state store is the scaling concern: the group key
(2-hex prefix → 256 groups here; thousands on a real cluster) shards state
across executors, and RocksDB-backed state (a spark-submit conf) bounds
memory. A TTL via ``GroupStateTimeout.ProcessingTimeTimeout`` would age
out old crawls; the test uses no timeout (NoTimeout) for determinism.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "url string, lang string, warc_epoch long"
STATE_SCHEMA = "seen array<string>"


def _dedup_group(key, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    outs = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["warc_epoch", "url"])
        # vectorized first-seen: drop within-batch repeats, then rows whose
        # url is already in cross-batch state
        fresh = pdf[~pdf["url"].duplicated(keep="first")
                    & ~pdf["url"].isin(seen)]
        if len(fresh):
            outs.append(fresh[["url", "lang", "warc_epoch"]]
                        .astype({"warc_epoch": "int64"}))
            seen.update(fresh["url"].tolist())
    state.update((sorted(seen),))
    if outs:
        yield pd.concat(outs, ignore_index=True)


def streaming_first_seen_dedup(pages: DataFrame) -> DataFrame:
    """pages stream → first-seen rows only (exactly-once per url across
    all micro-batches, state carried between batches)."""
    keyed = (pages
             .withColumn("warc_epoch", F.unix_timestamp("warc_ts"))
             .withColumn("shard", F.substring(F.md5("url"), 1, 2))
             .select("shard", "url", "lang", "warc_epoch"))
    return (keyed.groupBy("shard")
            .applyInPandasWithState(_dedup_group, OUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
