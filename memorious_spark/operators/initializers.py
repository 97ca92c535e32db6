"""Frontier initializers — the generator operators of the reference
(memorious/operations/initializers.py), as DataFrame sources.

The reference emits one task dict per item, optionally recursing with
a delay (sequence :35-75, dates :78-109); batch semantics collapse
each recursion into a single generated DataFrame. ``tee`` (:29-32) is
DAG fan-out — reuse one DataFrame for several downstream writes.
"""

from __future__ import annotations

import re
from datetime import date, datetime, timedelta

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

__all__ = [
    "seed", "enumerate_items", "sequence", "dates", "tee",
    "template_col", "compile_initial_frontier",
]


def seed(spark: SparkSession, urls: list[str], data: dict | None = None) -> DataFrame:
    """Emit {"url": u} per configured URL; %-style templates are
    formatted against ``data`` (initializers.py:5-18)."""
    if data:
        urls = [u % data for u in urls]
    return spark.createDataFrame(
        [(u, i) for i, u in enumerate(urls)], "url string, seq long"
    )


def enumerate_items(spark: SparkSession, items: list) -> DataFrame:
    """Each configured item as a row (initializers.py:21-26)."""
    return spark.createDataFrame(
        [(str(x), i) for i, x in enumerate(items)], "item string, seq long"
    )


def sequence(
    spark: SparkSession,
    start: int = 1,
    stop: int | None = None,
    step: int = 1,
    tag: str | None = None,
    store=None,
) -> DataFrame:
    """Number generator (initializers.py:35-75). The reference's
    one-by-one delayed recursion collapses into ``spark.range``.

    ``tag`` + ``store`` (a RunStore) give the cross-run once-only
    semantics of initializers.py:49-65: each emitted number is tagged
    ``<tag>:<number>`` crawler-scoped; numbers already tagged by an
    earlier run are skipped. The fresh batch is materialized BEFORE
    the tag append (the anti-join snapshot must not see its own
    write)."""
    assert stop is not None, "stop required in batch mode"
    out = spark.range(start, stop, step).select(F.col("id").alias("number"))
    if tag is not None and store is not None:
        existing = store.read_shared(spark, f"seq_{tag}", "number long")
        if existing is not None:
            out = out.join(existing.hint("shuffle_hash"), "number", "left_anti")
        out = out.persist()
        out.count()
        store.append_shared(f"seq_{tag}", out)
    return out


def dates(
    spark: SparkSession,
    begin: str | date | datetime,
    end: str | date | datetime,
    days: int = 1,
    weeks: int = 0,
) -> DataFrame:
    """Backwards date sequence from ``end`` to ``begin``
    (initializers.py:78-109): emits date + ISO string, newest first."""
    step_days = days + 7 * weeks
    assert step_days > 0
    return (
        spark.sql(
            f"""
            SELECT explode(sequence(
                to_timestamp('{end}'), to_timestamp('{begin}'),
                interval -{step_days} days)) AS date
            """
        )
        .select("date", F.date_format("date", "yyyy-MM-dd").alias("date_iso"))
    )


def tee(df: DataFrame) -> DataFrame:
    """Fan-out: same rows to every handler (initializers.py:29-32) —
    persist so each downstream branch reuses one computation."""
    return df.persist()


# ---- YAML-compiled generator init → round-0 frontier -----------------

_TMPL_RE = re.compile(r"%\((\w+)\)([sd])")

# strftime → Spark datetime-pattern directives (the subset the dates
# initializer's `format` param realistically uses)
_STRF = (
    ("%Y", "yyyy"), ("%y", "yy"), ("%m", "MM"), ("%d", "dd"),
    ("%H", "HH"), ("%M", "mm"), ("%S", "ss"), ("%j", "DDD"),
)


def _strftime_to_spark(fmt: str) -> str:
    for k, v in _STRF:
        fmt = fmt.replace(k, v)
    if "%" in fmt:
        raise ValueError(f"unsupported strftime directive in {fmt!r}")
    return fmt


def template_col(template: str, fields: dict[str, Column]) -> Column:
    """Python %-dict template → Column (the ``url % data`` of the
    reference seed, initializers.py:5-18): ``%(name)s``/``%(name)d``
    tokens become the generated-field columns, the rest is literal.
    ``%%`` is tokenized FIRST (split before matching), so an escaped
    ``%%(name)s`` renders the literal ``%(name)s`` exactly like
    Python's ``%`` operator — never substituted. Unknown field names
    and unsupported conversions (``%(n)05d`` etc.) fail at compile
    time — the reference would ValueError/KeyError per task."""
    # str parts are merged literals; Columns are field substitutions
    parts: list[object] = []

    def _lit(s: str) -> None:
        if s:
            if parts and isinstance(parts[-1], str):
                parts[-1] = parts[-1] + s
            else:
                parts.append(s)

    def _seg_lit(s: str) -> None:
        # within one %%-free segment, any residual '%(' is a template
        # token the supported-conversion regex did NOT consume
        if "%(" in s:
            at = s[s.index("%(") :][:24]
            raise ValueError(
                f"seed template {template!r}: unsupported % conversion at "
                f"{at!r} (only %(name)s / %(name)d)"
            )
        _lit(s)

    for i, seg in enumerate(template.split("%%")):
        if i:
            _lit("%")  # the literal '%' the escape stands for
        pos = 0
        for m in _TMPL_RE.finditer(seg):
            _seg_lit(seg[pos : m.start()])
            name = m.group(1)
            if name not in fields:
                raise KeyError(
                    f"seed template {template!r}: generator emits no field "
                    f"{name!r} (has: {sorted(fields)})"
                )
            col = fields[name]
            if m.group(2) == "d":
                col = col.cast("long")
            parts.append(col.cast("string"))
            pos = m.end()
        _seg_lit(seg[pos:])
    cols = [F.lit(p) if isinstance(p, str) else p for p in parts] or [F.lit("")]
    return cols[0] if len(cols) == 1 else F.concat(*cols)


def compile_initial_frontier(
    spark: SparkSession, cfg, store=None
) -> DataFrame:
    """Materialize a generator-init YAML config's round-0 frontier:
    ``(url string, emit_seq long)``.

    Reproduces the reference's sequential emit order without a driver
    loop: item ``i`` (generation order) feeding ``T`` flattened seed
    templates emits urls with ``emit_seq = i·T + j`` — exactly the
    FIFO order of generator → (tee →) seed → fetch
    (initializers.py:35-109 recursion flattened to one DataFrame).
    ``emit_seq`` is an ORDER KEY, not a dense id: a sequence ``tag``
    skip (once-only numbers) leaves gaps, which preserves relative
    order — the only contract the frontier uses.
    """
    p = dict(cfg.init_params or {})
    templates = list(cfg.seed_templates)
    method = cfg.init_method
    if method == "sequence":
        start, step = int(p.get("start", 1)), int(p.get("step", 1))
        gen = sequence(
            spark, start=start, stop=int(p["stop"]), step=step,
            tag=p.get("tag"), store=store,
        )
        item_idx = ((F.col("number") - F.lit(start)) / F.lit(step)).cast("long")
        fields = {"number": F.col("number")}
    elif method == "enumerate":
        gen = enumerate_items(spark, p.get("items") or [])
        item_idx = F.col("seq")
        fields = {"item": F.col("item")}
    elif method == "dates":
        fmt = p.get("format", "%Y-%m-%d")
        step_days = int(p.get("days", 0)) + 7 * int(p.get("weeks", 0))
        if step_days <= 0:
            raise ValueError("dates init: no interval given (days/weeks)")
        end = datetime.strptime(str(p["end"]), fmt)
        begin = (
            datetime.strptime(str(p["begin"]), fmt)
            if "begin" in p
            else end - timedelta(days=step_days) * int(p.get("steps", 100))
        )
        gen = dates(
            spark, begin.isoformat(sep=" "), end.isoformat(sep=" "),
            days=int(p.get("days", 0)), weeks=int(p.get("weeks", 0)),
        )
        # newest-first index: whole-day steps back from `end`
        item_idx = F.floor(
            F.datediff(
                F.lit(end.strftime("%Y-%m-%d")).cast("date"),
                F.col("date").cast("date"),
            ) / F.lit(step_days)
        ).cast("long")
        fields = {
            "date": F.date_format("date", _strftime_to_spark(fmt)),
            # python datetime.isoformat() shape (initializers.py:104)
            "date_iso": F.date_format("date", "yyyy-MM-dd'T'HH:mm:ss"),
        }
    else:
        raise ValueError(f"not a generator init method: {method!r}")

    n = len(templates)
    urls = F.array(*[template_col(t, fields) for t in templates])
    return gen.select(
        item_idx.alias("_i"), F.posexplode(urls).alias("_j", "url")
    ).select("url", (F.col("_i") * n + F.col("_j")).cast("long").alias("emit_seq"))
