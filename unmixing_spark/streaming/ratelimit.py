"""Custom stateful streaming operator: per-host politeness rate limiter.

The streaming twin of q_crawl_frontier (queries/crawl_q.py): as discovered
pages stream in, each host's fetches are serialized one per crawl-delay
window — the token-bucket/fetch-queue every polite crawler runs online
rather than as a batch schedule. Grouped state (applyInPandasWithState,
the task brief's custom-stateful extension point) carries per host:

- ``k_next`` — the next fetch sequence number, so numbering continues
  seamlessly across micro-batches, and
- ``first_epoch`` — the host's schedule anchor (min event time of its
  first batch), so later batches append to the SAME schedule instead of
  restarting it.

Each admitted row gets ``sched_epoch = first_epoch + k * delay_s`` with
the per-host delay the SAME md5 function q_crawl_frontier uses
(dialect-invariant, so batch and streaming schedules agree by
construction). Within a batch rows are ordered (warc_epoch, url) — the
deterministic FIFO the batch twin's window uses.

Scale shape: state is two bigints per host (~10^7 hosts — trivially
sharded by the group key across executors; RocksDB state backing is a
spark-submit conf away); each micro-batch does one host-keyed exchange,
identical to the batch operator. A TTL (ProcessingTimeTimeout) would
retire hosts idle across crawls; tests use NoTimeout for determinism.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("url string, host string, k bigint, delay_s bigint, "
              "sched_epoch bigint")
STATE_SCHEMA = "k_next bigint, first_epoch bigint"

DELAY_MODS = 5   # keep in lockstep with crawl_q.FRONTIER_DELAY_MODS


def host_delay_s(host: str) -> int:
    """Python twin of q_crawl_frontier's per-host delay expression
    (1 + md5('d'||host)[:8] % DELAY_MODS seconds)."""
    h = int(hashlib.md5(f"d{host}".encode()).hexdigest()[:8], 16)
    return 1 + h % DELAY_MODS


def _limit_group(key, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    # drain the iterator FIRST: a micro-batch arrives as Arrow-sized
    # chunks, and sorting/anchoring per chunk would order (and anchor)
    # each chunk independently — the whole batch must sort as one FIFO
    host = key[0]
    delay = host_delay_s(host)
    if state.exists:
        k_next, first_epoch = state.get
    else:
        k_next, first_epoch = 0, None
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        state.update((k_next, 0 if first_epoch is None else int(first_epoch)))
        return
    pdf = (pd.concat(chunks, ignore_index=True)
           .sort_values(["warc_epoch", "url"]))
    if first_epoch is None:
        first_epoch = int(pdf["warc_epoch"].iloc[0])
    n = len(pdf)
    ks = range(k_next, k_next + n)
    state.update((k_next + n, int(first_epoch)))
    yield pd.DataFrame({
        "url": pdf["url"].to_numpy(),
        "host": host,
        "k": list(ks),
        "delay_s": delay,
        "sched_epoch": [first_epoch + k * delay for k in ks],
    })


def streaming_host_rate_limit(pages: DataFrame) -> DataFrame:
    """pages stream → politeness-scheduled fetch queue rows (one per
    page): per-host FIFO sequence numbers and schedule epochs that
    continue across micro-batches through grouped state."""
    keyed = (pages
             .withColumn("warc_epoch", F.unix_timestamp("warc_ts"))
             .withColumn(
                 "host",
                 F.lower(F.split(F.split("url", "://")[1], "/")[0]))
             .select("host", "url", "warc_epoch"))
    return (keyed.groupBy("host")
            .applyInPandasWithState(_limit_group, OUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
