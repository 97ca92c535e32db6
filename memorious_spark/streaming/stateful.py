"""Stateful streaming politeness: the per-host budget as a custom
``applyInPandasWithState`` operator.

The batch engine discretizes "k requests per interval per host"
(memorious/logic/http.py:209-214, stage parking queue.py:30-37) into
frontier rounds. On the continuous-ingest face the same contract is a
KEYED STATE problem: candidate urls stream in, and each host may
release at most ``budget`` of them per trigger, FIFO, with the excess
*parked in state* — exactly the reference's parked queue, but the
queue lives in Spark's state store (checkpointed, exactly-once per
the streaming sink contract).

State per host = the pending FIFO (url, emit_seq arrays, capped) +
a served counter. On every trigger a host group emits
``min(budget, pending + new)`` rows in emit_seq order and parks the
rest; a processing-time timeout drains hosts that stop receiving new
candidates (otherwise a parked url would wait forever for its host's
next inbound batch).

This is the (c)-tier custom-operator path of the build rules: the
semantics (cross-batch FIFO park/release per key) are not expressible
as a composition of stateless DataFrame ops over an unbounded stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["politeness_release"]

_STATE_SCHEMA = (
    "pending_urls array<string>, pending_seqs array<long>, "
    "pending_atts array<int>, served long"
)
_OUT_SCHEMA = (
    "host string, url string, emit_seq long, attempt int, served_total long"
)

# park at most this many urls per host — beyond it, newest are dropped
# (the batch engine's frontier has no such cap; a stream must bound
# state. Equivalent of MAX_QUEUE_LENGTH, memorious/settings.py:41.)
_MAX_PENDING = 50_000


def politeness_release(
    candidates: DataFrame,
    budget: int,
    timeout_ms: int | None = None,
    max_pending: int = _MAX_PENDING,
    budget_overrides: dict[str, int] | None = None,
) -> DataFrame:
    """``candidates`` (streaming: host, url, emit_seq, attempt) → at most
    ``budget`` rows per host per trigger, FIFO by emit_seq, the rest
    parked in keyed state and released on later triggers.

    ``budget_overrides`` (host → budget) carries robots crawl-delay
    budgets onto the stream face — tiny by construction (one entry per
    robots-bearing host), shipped in the closure like the batch face's
    broadcast join.

    ``timeout_ms`` arms a processing-time timeout that drains parked
    urls for hosts that stop receiving new candidates — the right
    setting for a CONTINUOUS trigger. Leave it None for finite drains
    (``availableNow``): a registered timeout keeps the query cycling
    empty micro-batches until every host's park empties (observed:
    one 6-row file → 70+ batches over two timeout periods), whereas
    with NoTimeout the drain terminates and parked urls release on the
    host's next inbound batch."""

    def release(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        if state.exists:
            p_urls, p_seqs, p_atts, served = state.get
            pending = list(zip(p_urls, p_seqs, p_atts))
        else:
            pending, served = [], 0

        if not state.hasTimedOut:
            fresh = []
            for pdf in pdfs:
                atts = (
                    pdf["attempt"]
                    if "attempt" in pdf.columns
                    else [0] * len(pdf)
                )
                fresh.extend(zip(pdf["url"], pdf["emit_seq"], atts))
            fresh.sort(key=lambda t: t[1])
            pending.extend(fresh)  # state is already FIFO; append batch
        pending = pending[:max_pending]

        eff_budget = (budget_overrides or {}).get(host, budget)
        out, rest = pending[:eff_budget], pending[eff_budget:]
        served += len(out)
        state.update((
            [u for u, _, _ in rest], [int(s) for _, s, _ in rest],
            [int(a) for _, _, a in rest], served,
        ))
        if timeout_ms is not None and rest:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "host": [host] * len(out),
                "url": [u for u, _, _ in out],
                "emit_seq": [int(s) for _, s, _ in out],
                "attempt": [int(a) for _, _, a in out],
                "served_total": [served] * len(out),
            }
        )

    return candidates.groupBy("host").applyInPandasWithState(
        release,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
