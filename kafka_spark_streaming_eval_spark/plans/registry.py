"""Query registry — the engine's declared query surface.

Every operator from SURVEY.md §2 (reference parity + north-star extensions)
is registered here as a named query: a Spark callable ``(spark, sf_dir) ->
DataFrame`` plus, when SQL-expressible, an equivalent DuckDB oracle SQL
string.  ``__spark_entry__.py`` exposes this registry to the driver, which
runs both sides at sf=0.01 and compares row count + schema + order-
insensitive value hash.

Determinism contract (so Spark and DuckDB hash-match bit-for-bit):

- Double sums are order-sensitive; any SUM over a double column goes through
  a DECIMAL cast (exact, order-independent) and back to double — helpers in
  ``functions.numeric``.  Averages are exact-sum / count, divided as doubles.
- Timestamps leave the query as ``unix_millis`` bigints or DATEs where
  possible; the session timezone is pinned to UTC (session.prep).
- Every computed column is aliased identically in the Spark code and the
  oracle SQL.
- Ordering never matters (the driver hash is order-insensitive), but ranked
  outputs carry explicit deterministic tie-breakers.
"""

from __future__ import annotations

import ast
import glob
import hashlib
import inspect
import json
import os
import re
import textwrap
import weakref
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered table views
    category: str
    doc: str = field(default="")


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, category: str, oracle: str | None = None):
    """Decorator: register a query under ``name``.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator (custom
    stateful streaming, approximate sketches at default accuracy, ...); the
    driver then records a weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, category, fn.__doc__ or "")
        return fn

    return deco


# (module, qualname, oracle) -> (weakref-to-__code__, digest).  One entry
# per registered query NAME, replaced in place on importlib.reload — the
# pre-r11 scheme put the __code__ object INSIDE the key, so every reload
# appended a new entry and pinned every historical code object forever
# (ADVICE r9/r10 finding).  The weakref keeps the change-detection property
# (a live `ref() is fn.__code__` identity check can never alias a reused
# CPython id) without pinning: a reloaded module's old code objects get
# GC'd normally and their entries simply miss on the next lookup.
_HASH_CACHE: dict[tuple, tuple] = {}


def content_hash(spec: QuerySpec) -> str:
    """Semantic fingerprint of a query: AST-normalized function body (the
    docstring and decorator list stripped, so doc/comment/formatting edits
    do NOT change it) + the oracle SQL.

    Used by the verification rotation (VERDICT r6 item 2): a green
    CORRECTNESS row only counts for the code it actually verified, so a
    body or oracle rewrite resets the query to never-green and it re-enters
    the driver budget first.
    """
    key = (spec.fn.__module__, spec.fn.__qualname__, spec.oracle)
    hit = _HASH_CACHE.get(key)
    if hit is not None:
        code_ref, cached = hit
        # identity check against the LIVE code object: after a reload the
        # old code is GC'd (ref() -> None) or simply a different object,
        # and either way we recompute instead of serving a stale digest
        if code_ref() is spec.fn.__code__:
            return cached
    try:
        src = textwrap.dedent(inspect.getsource(spec.fn))
        tree = ast.parse(src)
        fndef = tree.body[0]
        if isinstance(fndef, (ast.FunctionDef, ast.AsyncFunctionDef)):
            fndef.decorator_list = []  # @register(...) carries name/category
            fndef.name = "_q"  # a pure rename is not a behavior change
            body = fndef.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                fndef.body = body[1:] or [ast.Pass()]
        normalized = ast.dump(tree)
    except (OSError, TypeError, SyntaxError):
        # source unavailable (exec'd / C-level): fall back to bytecode +
        # constants — still resets on real behavior changes.  Only the
        # docstring constant is dropped: stripping ALL strings would let a
        # behavior change to a string literal (e.g. a column name) keep a
        # stale green stamp.
        code = spec.fn.__code__
        doc = spec.fn.__doc__
        consts = tuple(
            c for c in code.co_consts if not (isinstance(c, str) and c == doc)
        )
        normalized = repr((code.co_code, consts, code.co_names))
    digest = hashlib.md5(
        (normalized + "\x00" + (spec.oracle or "")).encode()
    ).hexdigest()
    _HASH_CACHE[key] = (weakref.ref(spec.fn.__code__), digest)
    return digest


def _ledger_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "green_hashes.json")


def _green_hash_ledger() -> dict[str, dict]:
    """name -> {"hash": <content_hash at green time>, "round": N}.

    Committed alongside the code; re-stamped at each round start (after the
    driver's CORRECTNESS report lands, before any edits) via
    ``python -m kafka_spark_streaming_eval_spark.plans.registry stamp``.
    """
    try:
        with open(_ledger_path()) as f:
            ledger = json.load(f)
    except (OSError, ValueError):
        return {}
    return ledger if isinstance(ledger, dict) else {}


def _last_green_round() -> dict[str, int]:
    """Per query, the latest round whose CORRECTNESS report verified it green.

    The per-round driver budget covers a prefix of the ``queries()`` dict, so
    ordering is coverage policy: queries that have never earned a green
    CORRECTNESS row (hash_match=true, or a clean rows-only check for
    oracle-less entries) must run before queries already verified, and among
    the verified ones the stalest verification re-runs first.  This reads the
    committed ``CORRECTNESS_r*.json`` reports so the rotation advances by
    itself every round.
    """
    _load_all()  # oracle presence feeds the rows-only rule below
    roots = {os.getcwd()}
    # plans/registry.py -> plans -> package -> repo root (three dirnames, not
    # four: four lands on the repo's PARENT and the glob silently finds no
    # CORRECTNESS reports when cwd isn't the repo root).
    here = os.path.abspath(__file__)
    roots.add(os.path.dirname(os.path.dirname(os.path.dirname(here))))
    last_green: dict[str, int] = {}
    for root in roots:
        for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
            m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
            if not m:
                continue
            rnd = int(m.group(1))
            try:
                with open(path) as f:
                    report = json.load(f)
            except (OSError, ValueError):
                continue
            if not isinstance(report, dict):
                continue
            for name, row in report.items():
                if not isinstance(row, dict):
                    continue
                # A rows-only ("no_oracle") record only counts as verified if
                # the query STILL has no oracle — once an oracle is added, the
                # stronger hash check must actually run before it sorts back.
                rows_only_ok = (
                    row.get("err") == "no_oracle"
                    and row.get("spark_rows") is not None
                    and name in _REGISTRY
                    and _REGISTRY[name].oracle is None
                )
                if row.get("hash_match") is True or rows_only_ok:
                    last_green[name] = max(last_green.get(name, 0), rnd)
    # A green row only counts for the code it verified (VERDICT r6 item 2):
    # if the query's current content hash differs from the hash recorded in
    # the green-hash ledger at stamp time — or was never stamped at all —
    # the implementation changed (or was never hash-attested) since the
    # driver last saw it, and the query re-enters the rotation never-green.
    ledger = _green_hash_ledger()
    for name in list(last_green):
        spec = _REGISTRY.get(name)
        if spec is None:
            continue
        rec = ledger.get(name)
        if not isinstance(rec, dict) or rec.get("hash") != content_hash(spec):
            del last_green[name]
    return last_green


def stamp_green_hashes() -> dict[str, dict]:
    """Re-stamp the green-hash ledger from the committed CORRECTNESS reports.

    Run at ROUND START, right after the driver's new CORRECTNESS report
    lands and BEFORE any code edits — at that moment the working tree is
    exactly the code the driver verified, so stamping current hashes is
    sound.  Rules per query: first stamp trusts current code at the latest
    green round; an unchanged hash only advances the round; a changed hash
    re-stamps ONLY if a green round NEWER than the recorded stamp exists
    (i.e. the driver re-verified after the rewrite).
    """
    _load_all()
    # newest green round per name, straight from the reports (pre-ledger)
    raw_green: dict[str, int] = {}
    here = os.path.abspath(__file__)
    root = os.path.dirname(os.path.dirname(os.path.dirname(here)))
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                report = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(report, dict):
            continue
        for name, row in report.items():
            if not isinstance(row, dict):
                continue
            rows_only_ok = (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
                and name in _REGISTRY
                and _REGISTRY[name].oracle is None
            )
            if row.get("hash_match") is True or rows_only_ok:
                raw_green[name] = max(raw_green.get(name, 0), rnd)
    ledger = _green_hash_ledger()
    for name, rnd in sorted(raw_green.items()):
        spec = _REGISTRY.get(name)
        if spec is None:
            continue
        cur = content_hash(spec)
        rec = ledger.get(name)
        if not isinstance(rec, dict):
            ledger[name] = {"hash": cur, "round": rnd}
        elif rec.get("hash") == cur:
            rec["round"] = max(int(rec.get("round", 0)), rnd)
        elif rnd > int(rec.get("round", 0)):
            ledger[name] = {"hash": cur, "round": rnd}
    with open(_ledger_path(), "w") as f:
        json.dump(ledger, f, indent=0, sort_keys=True)
        f.write("\n")
    return ledger


# Coverage-policy pins (VERDICT r7 item 5): name -> round by which the
# driver must have re-verified the query.  A pin is ACTIVE while the query's
# last green round is below that target; active pins sort immediately AFTER
# never-green queries and before all stale-green rotation, then self-clear
# once the demanded CORRECTNESS row lands (no per-round curation, no wasted
# budget slots afterwards).  These four stream queries execute their
# pipeline on plan-build, so PLAN_AUDIT excludes them (documented) — driver
# re-verification is their only end-to-end re-check, and being
# streaming-slow they must not slip out of the 50-query budget two rounds
# running: demand a green check in round >= 8.
ROTATION_PINS: dict[str, int] = {
    "stream_stateful_running_count": 8,
    "stream_python_datasource_source": 8,
    "stream_stream_left_outer_join": 8,
    "stream_foreachbatch_merge_upsert": 8,
}


def all_queries() -> dict[str, QuerySpec]:
    """Name -> spec for every registered query (imports operator modules).

    Ordered for driver verification rotation: never-green queries first (in
    registration order), then active ROTATION_PINS, then green queries
    stalest-verification-first.
    """
    _load_all()
    last_green = _last_green_round()
    reg_index = {name: i for i, name in enumerate(_REGISTRY)}

    def key(n: str):
        rnd = last_green.get(n, -1)
        if 0 <= rnd < ROTATION_PINS.get(n, 0):
            rnd = 0  # after never-green (-1), before every real round (>=1)
        return (rnd, reg_index[n])

    ordered = sorted(_REGISTRY, key=key)
    return {name: _REGISTRY[name] for name in ordered}


def _load_all() -> None:
    # Import for side effect: each module registers its queries on import.
    from kafka_spark_streaming_eval_spark.operators import (  # noqa: F401
        dedup,
        etl,
        graph,
        metrics,
        multimodal,
        pipeline,
        quality,
        relational,
        similarity,
        text,
        tpch,
    )
    from kafka_spark_streaming_eval_spark.functions import udfs  # noqa: F401
    from kafka_spark_streaming_eval_spark.sources import readers  # noqa: F401
    from kafka_spark_streaming_eval_spark.streaming import queries, stateful  # noqa: F401

    # Round-N additions import LAST (in round order): their registration
    # index must sort AFTER every pre-existing never-green query so they
    # never displace the driver-rotation backlog that is still draining
    # (VERDICT r3 item 1).  Round 5: the 27-query backlog occupies rotation
    # positions 0-26 and the driver budget is 50, so the 14 round-5 additions
    # (5 in curation.py + 8 in curation2.py + src_xml_roundtrip_scan in
    # sources/readers.py) drain in the SAME round without displacing anything
    # — 41 never-green total, 9 budget slots spare (asserted in
    # tests/test_plans.py::test_rotation_order_never_green_first).
    from kafka_spark_streaming_eval_spark.operators import corpus  # noqa: F401
    from kafka_spark_streaming_eval_spark.operators import curation  # noqa: F401
    from kafka_spark_streaming_eval_spark.operators import curation2  # noqa: F401


if __name__ == "__main__":  # python -m kafka_spark_streaming_eval_spark.plans.registry stamp
    import sys

    # delegate to the canonical module instance: running under -m executes
    # THIS file as __main__, whose _REGISTRY the operator imports never touch
    from kafka_spark_streaming_eval_spark.plans import registry as _canonical

    if len(sys.argv) > 1 and sys.argv[1] == "stamp":
        ledger = _canonical.stamp_green_hashes()
        print(f"stamped {len(ledger)} green hashes -> {_canonical._ledger_path()}")
    else:
        print("usage: python -m kafka_spark_streaming_eval_spark.plans.registry stamp")
