"""YAML pipeline → frozen CrawlConfig.

Accepts the same YAML shape memorious crawls are written in
(memorious/logic/crawler.py:31-57 reads name/delay/expire/init;
memorious/logic/stage.py:8-18 reads method/params/handle per stage;
canonical example memorious/tests/testdata/config/simple_web_scraper.yml)
but compiles it ONCE, driver-side, failing fast on unknown stages or
ambiguous rules — the reference late-binds methods per task
(stage.py:20-31); we validate at load time (SURVEY.md §3.2).

Only the corpus-model subset is compiled: seed/sequence/dates/
enumerate initializers, fetch (rules, retries), parse (store rules,
meta, schema+properties, include_paths), store. Live-web operators
(session auth, aleph upload, FTP/WebDAV) have no meaning against a
page-corpus table and are rejected with a clear error.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml

from memorious_spark.operators.parse import ParseConfig
from memorious_spark.plans.rules import RuleError, compile_py, compile_rule

__all__ = ["CrawlConfig", "load_yaml", "load_config"]

_SUPPORTED_METHODS = {
    "seed", "sequence", "dates", "enumerate", "tee",
    "fetch", "parse", "extract", "clean_html", "directory", "db", "inspect",
}


@dataclass(frozen=True)
class CrawlConfig:
    name: str
    seeds: tuple[str, ...]
    fetch_rules: dict | None = None
    store_rules: dict | None = None
    parse: ParseConfig = field(default_factory=ParseConfig)
    budget_per_host: int = 1_000_000_000  # "unlimited" unless configured
    retries: int = 3
    # emit non-ok (status ≥ 400) responses downstream — the reference's
    # fetch param of the same name (memorious/operations/fetch.py:25)
    emit_errors: bool = False
    max_rounds: int = 25
    max_depth: int | None = None
    expire_days: int | None = None
    # incremental re-run mode: probe the crawler-scoped http_cache
    # (304 replay of unchanged pages) and skip re-storing content that
    # already carries an inc tag — memorious's INCREMENTAL setting
    # (memorious/settings.py:26, logic/context.py:127-148)
    incremental: bool = False
    # store-stage sink: the method/params of the stage the parse
    # stage's ``handle: {store: …}`` points at — "directory"
    # (operations/store.py:42-70) or "db" (operations/db.py:57-62);
    # None keeps the engine's relational parquet rounds only
    store_method: str | None = None
    store_params: dict | None = None
    # post-run aggregator hook (memorious/logic/crawler.py:66-87,
    # fired when the job drains, worker.py:22-27)
    aggregator: dict | None = None
    # `extract` stage configured (operations/extract.py:69-97): archive
    # responses additionally unpack into the run's `members` table
    extract_enabled: bool = False
    extract_wildcard: str | None = None
    # `inspect` debug stage (operations/debug.py:4-6): per-round sample
    # logging in the runner
    inspect_enabled: bool = False
    # DEBUG emit sampling (memorious/logic/context.py:56-61)
    sampling_rate: float | None = None
    # robots gating (north-rule addition, no reference analogue):
    # top-level `robots: true` derives the per-host gate table from
    # the corpus's own /robots.txt pages at run start
    use_robots: bool = False

    def fetch_rule_col(self):
        return compile_rule(self.fetch_rules)

    def store_rule_col(self):
        return compile_rule(self.store_rules)

    def fetch_rule_py(self):
        return compile_py(self.fetch_rules)

    def store_rule_py(self):
        return compile_py(self.store_rules)


def load_yaml(text: str) -> CrawlConfig:
    return load_config(yaml.safe_load(text))


def load_config(spec: dict) -> CrawlConfig:
    name = spec.get("name")
    if not name or not all(c.isalnum() or c in "_-" for c in name):
        raise ValueError(f"invalid crawler name: {name!r}")
    stages = spec.get("pipeline", {})
    init_name = spec.get("init", "init")
    if init_name not in stages:
        raise ValueError(f"init stage {init_name!r} not in pipeline")
    # validate handle targets + methods
    for sname, stage in stages.items():
        method = stage.get("method")
        if method not in _SUPPORTED_METHODS:
            raise ValueError(f"stage {sname!r}: unsupported method {method!r}")
        for target in (stage.get("handle") or {}).values():
            if target not in stages:
                raise ValueError(f"stage {sname!r} handles unknown stage {target!r}")

    seeds: tuple[str, ...] = ()
    fetch_rules = store_rules = None
    parse_cfg = ParseConfig()
    retries = 3
    emit_errors = False
    budget = 1_000_000_000
    store_stage_name = None
    store_method = store_params = None
    extract_enabled, extract_wildcard = False, None
    inspect_enabled = False
    for stage in stages.values():
        method = stage.get("method")
        params = stage.get("params") or {}
        if method == "seed":
            urls = params.get("urls") or params.get("url") or []
            if isinstance(urls, str):
                urls = [urls]
            seeds = tuple(urls)
        elif method == "fetch":
            fetch_rules = params.get("rules")
            retries = int(params.get("retry", 3))
            emit_errors = bool(params.get("emit_errors", False))
            if "rate_limit" in params:
                budget = int(params["rate_limit"])
        elif method == "extract":
            extract_enabled = True
            extract_wildcard = params.get("wildcard")
        elif method == "inspect":
            inspect_enabled = True
        elif method == "parse":
            store_rules = params.get("store")
            store_stage_name = (stage.get("handle") or {}).get("store")
            meta = {
                k: (v if isinstance(v, list) else [v])
                for k, v in (params.get("meta") or {}).items()
            }
            meta_dates = []
            for k, v in (params.get("meta_date") or {}).items():
                meta.setdefault(k, v if isinstance(v, list) else [v])
                meta_dates.append(k)
            parse_cfg = ParseConfig(
                meta=meta,
                meta_dates=tuple(meta_dates),
                properties=dict(params.get("properties") or {}),
                include_paths=(
                    tuple(params["include_paths"])
                    if params.get("include_paths")
                    else None
                ),
                schema=params.get("schema"),
            )
    # the parse stage's `store` handler names the sink stage; its
    # method+params drive the engine's store step (the reference
    # late-binds this per task, stage.py:20-31; we resolve at load)
    if store_stage_name is not None:
        sink = stages[store_stage_name]
        if sink.get("method") in ("directory", "db"):
            store_method = sink["method"]
            store_params = dict(sink.get("params") or {})
    # fail fast on bad rule specs (reference raises per-task; we at load)
    for rules in (fetch_rules, store_rules):
        try:
            compile_py(rules)
        except RuleError:
            raise
    return CrawlConfig(
        name=name,
        seeds=seeds,
        fetch_rules=fetch_rules,
        store_rules=store_rules,
        parse=parse_cfg,
        retries=retries,
        emit_errors=emit_errors,
        budget_per_host=budget,
        max_rounds=int(spec.get("max_rounds", 25)),
        max_depth=spec.get("max_depth"),
        expire_days=spec.get("expire"),
        incremental=bool(spec.get("incremental", False)),
        store_method=store_method,
        store_params=store_params,
        aggregator=spec.get("aggregator"),
        sampling_rate=spec.get("sampling_rate"),
        extract_enabled=extract_enabled,
        extract_wildcard=extract_wildcard,
        inspect_enabled=inspect_enabled,
        use_robots=bool(spec.get("robots", False)),
    )
