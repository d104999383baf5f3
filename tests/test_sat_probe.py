"""sat_probe contract: the settle-window selector (pure logic — the timed
streaming run needs an idle host and runs out-of-suite)."""

from sat_probe import settle_index, tail_eps


def test_settle_index_first_of_earliest_exact_run():
    # catch-up batches (4x, 3x rate), one wobble, then settled
    ev = [800_000, 600_000, 200_000, 200_000, 190_000, 200_000, 200_000,
          200_000, 200_000, 200_000]
    assert settle_index(ev, 200_000, 5) == 5
    # the window INCLUDES the k settle batches (opens at the run's start)
    assert settle_index(ev, 200_000, 2) == 2


def test_settle_index_empty_batches_break_runs_and_none_when_unsettled():
    assert settle_index([200_000, 0, 200_000], 200_000, 2) is None
    assert settle_index([], 200_000, 3) is None
    assert settle_index([100_000] * 10, 200_000, 1) is None


def test_tail_eps_convergence_discriminator():
    from sat_probe import tail_eps

    # the r11 300k "never settled" tail: 25.8M events in 17.8 s -> 1.45M eps
    tl = [[130.5, 11_100_000], [148.3, 25_800_000]]
    assert tail_eps(tl) == round(25_800_000 / 17.8, 1)
    assert tail_eps([[7.8, 600_000]]) is None
    assert tail_eps([]) is None
    # zero/negative span (duplicate completion stamps) must not divide
    assert tail_eps([[10.0, 1], [10.0, 2]]) is None


def test_tail_eps_accepts_steal_annotated_timeline():
    """r12: timeline entries grew a third element (steal ticks since the
    previous entry); tail_eps must read offsets/events by index, not
    2-tuple unpacking."""
    tl = [[10.0, 200000, 0], [11.0, 200000, 12], [12.0, 400000, None]]
    assert tail_eps(tl) == 400000.0
