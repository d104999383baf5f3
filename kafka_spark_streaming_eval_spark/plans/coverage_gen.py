"""Generated plan-facts section for COVERAGE.md (VERDICT r5 item 8).

Renders the audited physical-plan facts (PLAN_AUDIT.txt) per registry
category into a marker-delimited section of COVERAGE.md, replacing
hand-maintained scale-posture prose with generated truth:

    python -m kafka_spark_streaming_eval_spark.plans.coverage_gen

The output is deterministic (sorted categories, no timestamps), so a second
run over unchanged inputs is a no-op — and
``tests/test_plans.py::test_coverage_plan_facts_in_sync`` regenerates the
section in-memory and asserts COVERAGE.md matches, which forces this tool to
be re-run whenever PLAN_AUDIT.txt or the registry changes.
"""

from __future__ import annotations

import os

BEGIN = "<!-- BEGIN GENERATED PLAN FACTS (plans/coverage_gen.py) -->"
END = "<!-- END GENERATED PLAN FACTS -->"

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _audit_rows(path: str | None = None) -> dict[str, dict[str, int]]:
    path = path or os.path.join(_REPO, "PLAN_AUDIT.txt")
    rows: dict[str, dict[str, int]] = {}
    with open(path) as f:
        for line in f:
            if not line.strip() or line.startswith(("#", "-", "query ")):
                continue
            parts = line.split()
            trunc = 0
            if len(parts) == 8 and parts[7].startswith("trunc:"):
                # lineage-truncated row (iterative query): the 6 ints cover
                # only the post-checkpoint stage; trunc:N counts the
                # localCheckpoint truncation events during plan build
                trunc = int(parts[7].split(":", 1)[1])
                parts = parts[:7]
            if len(parts) != 7:
                # A data row that doesn't parse must SCREAM, not vanish:
                # silently skipping would understate the generated stats
                # while the name-only coverage test still passed.
                raise ValueError(
                    f"PLAN_AUDIT row is not 'name + 6 ints [trunc:N]' (got "
                    f"{len(parts)} fields): {line.rstrip()!r}"
                )
            name = parts[0]
            exch, bhj, smj, cart, pushed, wscg = map(int, parts[1:])
            rows[name] = {
                "exch": exch,
                "bhj": bhj,
                "smj": smj,
                "cart": cart,
                "pushed": pushed,
                "wscg": wscg,
                "trunc": trunc,
            }
    return rows


def render() -> str:
    """Render the generated section body (without the markers)."""
    from kafka_spark_streaming_eval_spark.plans.audit import _EXEC_ON_BUILD
    from kafka_spark_streaming_eval_spark.plans.registry import all_queries

    specs = all_queries()
    audit = _audit_rows()
    by_cat: dict[str, list[str]] = {}
    for name, spec in specs.items():
        by_cat.setdefault(spec.category, []).append(name)

    lines = [
        "Plan facts below are GENERATED from `PLAN_AUDIT.txt` (AQE-finalized",
        "executed plans, sf0.001) joined to the registry — regenerate with",
        "`python -m kafka_spark_streaming_eval_spark.plans.coverage_gen`",
        "after any plan-affecting change (a test keeps this in sync).",
        "",
        "| category | queries | audited | exchanges (sum/max) | broadcast joins "
        "| sort-merge joins | cartesians | zero-exchange | pushed-filter queries |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    tot = {"n": 0, "aud": 0, "exch": 0, "bhj": 0, "smj": 0, "cart": 0,
           "zero": 0, "pushed": 0}
    for cat in sorted(by_cat):
        names = by_cat[cat]
        aud = [audit[n] for n in names if n in audit]
        exch = [a["exch"] for a in aud]
        row = {
            "exch": sum(exch),
            "mx": max(exch, default=0),
            "bhj": sum(a["bhj"] for a in aud),
            "smj": sum(a["smj"] for a in aud),
            "cart": sum(a["cart"] for a in aud),
            "zero": sum(1 for a in aud if a["exch"] == 0),
            "pushed": sum(1 for a in aud if a["pushed"] > 0),
        }
        lines.append(
            f"| {cat} | {len(names)} | {len(aud)} | {row['exch']}/{row['mx']} "
            f"| {row['bhj']} | {row['smj']} | {row['cart']} | {row['zero']} "
            f"| {row['pushed']} |"
        )
        tot["n"] += len(names)
        tot["aud"] += len(aud)
        for k in ("exch", "bhj", "smj", "cart", "zero", "pushed"):
            tot[k] += row[k]
    mx_all = max((a["exch"] for a in audit.values()), default=0)
    lines.append(
        f"| **all** | **{tot['n']}** | **{tot['aud']}** | "
        f"**{tot['exch']}/{mx_all}** | **{tot['bhj']}** | **{tot['smj']}** | "
        f"**{tot['cart']}** | **{tot['zero']}** | **{tot['pushed']}** |"
    )
    lines.append("")

    smjs = sorted(n for n, a in audit.items() if a["smj"])
    lines.append(
        f"Sort-merge joins appear in exactly {len(smjs)} plans — "
        + ", ".join(f"`{n}`" for n in smjs)
        + " — the unavoidable full-outer merges plus the deliberately "
        "zero-exchange bucketed join (SMJ-without-Exchange is its point)."
    )
    heavy = sorted(audit, key=lambda n: -audit[n]["exch"])[:5]
    lines.append(
        "Deepest exchange chains: "
        + ", ".join(f"`{n}` ({audit[n]['exch']})" for n in heavy)
        + " — each justified in its operator docstring (iterative/multi-stage "
        "shapes, never a per-group or per-row loop)."
    )
    truncd = sorted(n for n, a in audit.items() if a.get("trunc"))
    if truncd:
        lines.append(
            "Lineage-truncated rows (localCheckpoint fired during plan "
            "build, so the ints cover only the post-checkpoint stage): "
            + ", ".join(f"`{n}` (trunc:{audit[n]['trunc']})" for n in truncd)
            + " — the full un-truncated lineage for each is audited in "
            "`PLAN_AUDIT.txt`'s header (`--no-trunc` mode)."
        )
    excl = ", ".join(f"`{n}`" for n in sorted(_EXEC_ON_BUILD))
    lines.append(
        f"Not auditable by plan-build (streaming execution): {excl} — "
        "covered by pytest instead; the coverage invariant "
        "(`test_plan_audit_covers_registry`) pins rows + exclusions == "
        "registry."
    )
    return "\n".join(lines)


def update_coverage_md(path: str | None = None) -> bool:
    """Insert/replace the generated section in COVERAGE.md.  Returns True if
    the file changed."""
    path = path or os.path.join(_REPO, "COVERAGE.md")
    with open(path) as f:
        text = f.read()
    section = f"{BEGIN}\n{render()}\n{END}"
    if BEGIN in text:
        pre = text.split(BEGIN)[0]
        post = text.split(END, 1)[1]
        new = pre + section + post
    else:
        new = text.rstrip("\n") + "\n\n## Generated plan facts\n\n" + section + "\n"
    if new != text:
        with open(path, "w") as f:
            f.write(new)
        return True
    return False


if __name__ == "__main__":
    print("updated" if update_coverage_md() else "unchanged")
