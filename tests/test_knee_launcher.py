"""knee_launcher accept-rule contract (r14): the quiet-gated battery
launcher must never record a storm-buried non-settle as a knee verdict."""

from __future__ import annotations

import knee_launcher as kl


def test_settled_accepted_at_any_steal():
    assert kl.accept_verdict(
        {"sustained_eps": 450000.0, "steal": {"steal_pct": 2.82}}
    )
    assert kl.accept_verdict({"sustained_eps": 250000.0, "steal": {}})
    assert kl.accept_verdict({"sustained_eps": 250000.0})


def test_never_settled_needs_a_quiet_span():
    stormy = {"error": "never settled", "steal": {"steal_pct": 3.1}}
    quiet = {"error": "never settled", "steal": {"steal_pct": 0.71}}
    assert not kl.accept_verdict(stormy)
    assert kl.accept_verdict(quiet)


def test_never_settled_weather_unknown_rejected():
    assert not kl.accept_verdict({"error": "never settled", "steal": {}})
    assert not kl.accept_verdict({"error": "never settled"})
    assert not kl.accept_verdict(
        {"error": "never settled", "steal": {"steal_pct": None}}
    )
