"""Property-based checks (hypothesis) of the semantic formulas the
engine and its oracles share — pure Python, no Spark session:

- sliding-window assignment enumeration == brute-force membership
- session gap/island segmentation == naive merge simulation
- count-or-time segment chunking == an event-by-event simulation of
  the reference trigger's FIRE_AND_PURGE state machine
  (reference: master/src/main/java/InorderTumblingWindow/CustomTrigger.java:34-78)
"""

from __future__ import annotations

from hypothesis import example, given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(
    t=st.integers(min_value=0, max_value=10**12),
    size_k=st.integers(min_value=1, max_value=50),
    slide=st.integers(min_value=1, max_value=10**6),
)
# once-failing input found by hypothesis in round 1 (pinned here rather
# than via the .hypothesis example database, which is not committed)
@example(t=0, size_k=1, slide=1)
def test_sliding_window_enumeration(t, size_k, slide):
    """The closed-form used by sql_slide (and Spark's Expand): starts
    w = floor(t/slide)*slide - i*slide with w > t - size, i in
    [0, ceil(size/slide)) — must equal brute-force membership."""
    size = size_k * slide // max(1, size_k // 7 + 1) + slide  # varied, >= slide
    nwin = -(-size // slide)
    formula = {
        (t // slide) * slide - i * slide
        for i in range(nwin)
        if (t // slide) * slide - i * slide > t - size
    }
    lo = (t - size) // slide * slide  # may be negative: pre-epoch starts exist
    brute = {
        w
        for w in range(lo - slide, t + slide + 1, slide)
        if w % slide == 0 and w <= t < w + size
    }
    assert formula == brute


@settings(max_examples=200, deadline=None)
@given(
    ts=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=60),
    gap=st.integers(min_value=1, max_value=10**5),
)
def test_session_islands_equal_merge_simulation(ts, gap):
    """Gap-based island ids (the oracle's lag/cumsum form) must equal
    the merge-sessions-while-overlapping simulation (Spark semantics:
    merge iff next_start < current_end, end = last + gap)."""
    xs = sorted(ts)
    # oracle form: break when diff >= gap
    islands, cur = [], [xs[0]]
    for prev, x in zip(xs, xs[1:]):
        if x - prev >= gap:
            islands.append(cur)
            cur = [x]
        else:
            cur.append(x)
    islands.append(cur)
    # simulation: windows [t, t+gap) merged while overlapping
    sim, start, end = [], xs[0], xs[0] + gap
    members = [xs[0]]
    for x in xs[1:]:
        if x < end:
            members.append(x)
            end = x + gap
        else:
            sim.append((start, members))
            start, end, members = x, x + gap, [x]
    sim.append((start, members))
    assert [(i[0], i) for i in islands] == [(s[1][0], s[1]) for s in sim]


@settings(max_examples=200, deadline=None)
@given(
    amounts=st.lists(
        st.floats(min_value=0.01, max_value=100, allow_nan=False), min_size=1, max_size=80
    ),
    max_count=st.integers(min_value=1, max_value=7),
)
def test_count_trigger_segments_equal_state_machine(amounts, max_count):
    """The (row_number-1)/max_count chunking used by
    count_or_time_segments must equal an event-by-event state machine:
    count state per window, FIRE_AND_PURGE when count reaches
    max_count (count RESETS on fire), final FIRE at the window-end
    timer. Note this is the *intended* reset-on-fire semantics — the
    reference's CustomTrigger never clears its count on fire (a bug;
    after the first fire it fires per element); see the deliberate-
    deviation note on count_or_time_segments."""
    # chunking form
    chunks = [
        amounts[i : i + max_count] for i in range(0, len(amounts), max_count)
    ]
    want = [
        (sum(c), len(c), "early" if len(c) == max_count else "final") for c in chunks
    ]
    # state machine: onElement count++/sum+=; fire early at max_count,
    # purge; at end-of-window timer fire whatever remains
    fired, s, c = [], 0.0, 0
    for a in amounts:
        s += a
        c += 1
        if c >= max_count:
            fired.append((s, c, "early"))
            s, c = 0.0, 0
    if c > 0:
        fired.append((s, c, "final"))
    assert len(fired) == len(want)
    for (fs, fc, fe), (ws, wc, we) in zip(fired, want):
        assert fc == wc and fe == we and abs(fs - ws) < 1e-9


@settings(max_examples=300, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),  # tight domain: force ties
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=0,
        max_size=40,
    )
)
def test_funnel_fold_equals_conditional_min_joins(evs):
    """funnel_view_click_purchase's two forms must agree on EVERY input,
    including duplicate timestamps across types (the fixture happens to
    have none; the strict-inequality stage gates make ties safe and
    this pins that): the in-scan greedy fold over the (t, type)-sorted
    array == the oracle's 3-level conditional-min joins."""
    # fold form (the Spark aggregate() lambda, literally transcribed)
    v = c = p = None
    for t, typ in sorted(evs):
        if v is None and typ == "view":
            v = t
        if c is None and v is not None and typ == "click" and t > v:
            c = t
        if p is None and c is not None and typ == "purchase" and t > c:
            p = t
    # oracle form: set-wide conditional minima
    views = [t for t, ty in evs if ty == "view"]
    ov = min(views) if views else None
    clicks = [t for t, ty in evs if ty == "click" and ov is not None and t > ov]
    oc = min(clicks) if clicks else None
    purchases = [t for t, ty in evs if ty == "purchase" and oc is not None and t > oc]
    op = min(purchases) if purchases else None
    assert (v, c, p) == (ov, oc, op), (evs, (v, c, p), (ov, oc, op))


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=2000))
@example(1)
@example(64)
@example(65)
@example(48)
@example(49)
def test_chunk_starts_cover_every_token(n):
    """doc_chunk_windows' start formula — sequence(0, greatest(n-1,0),
    STRIDE) with windows [st, min(st+SIZE, n)) — must cover every token
    index exactly, never emit an empty chunk, and overlap consecutive
    chunks by SIZE-STRIDE except at the tail. Pure model of the
    SQL/DataFrame formula (SIZE=64, STRIDE=48)."""
    SIZE, STRIDE = 64, 48
    starts = list(range(0, max(n - 1, 0) + 1, STRIDE))
    covered = set()
    for s in starts:
        end = min(s + SIZE, n)
        assert end > s, (n, s)  # no empty chunk
        covered.update(range(s, end))
    assert covered == set(range(n))
    for a, b in zip(starts, starts[1:]):
        overlap = min(a + SIZE, n) - b
        assert overlap == min(SIZE - STRIDE, n - b), (n, a, b)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=50,
    )
)
def test_ewma_stays_within_seen_minmax(xs):
    """The EWMA recursion (seed = first value, then a*x + (1-a)*prev)
    is a convex combination at every step, so it can never leave the
    [min, max] envelope of the values seen so far — the invariant that
    makes it a usable adaptive baseline."""
    alpha = 0.2
    prev = xs[0]
    lo = hi = xs[0]
    for x in xs[1:]:
        prev = alpha * x + (1 - alpha) * prev
        lo, hi = min(lo, x), max(hi, x)
        assert lo - 1e-9 <= prev <= hi + 1e-9, (xs, prev, lo, hi)


@given(
    ts=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=120),
    size=st.integers(min_value=1, max_value=20),
    cap=st.integers(min_value=1, max_value=6),
)
def test_bounded_buffer_survivors_equal_queue_simulation(ts, size, cap):
    """The WA4 oracle's derivation — over an IN-ORDER stream,
    evict-earliest at capacity leaves exactly the cap most-recent
    windows per key, each with its COMPLETE sum — must equal an
    event-by-event bounded-queue state machine (offer the new window;
    at capacity poll the earliest-ending one and clear its buffer —
    reference TumblingWindowWithTest CustomTumblingWindow.java:112-118).
    This is the reasoning step that turns the queue semantics into the
    registered face's top-cap-per-account SQL oracle; an off-by-one on
    the cap, a re-opened window, or a partial carried sum breaks it."""
    ts = sorted(ts)  # the in-order contract the face replays under
    amounts = [float(i + 1) for i in range(len(ts))]
    # event-by-event bounded queue (the reference's semantics)
    buf: dict[int, float] = {}
    for t, a in zip(ts, amounts):
        w = t - t % size
        if w not in buf:
            if len(buf) >= cap:
                buf.pop(min(buf))
            buf[w] = 0.0
        buf[w] += a
    # the oracle's closed form: top-cap windows by w_start, full sums
    sums: dict[int, float] = {}
    for t, a in zip(ts, amounts):
        w = t - t % size
        sums[w] = sums.get(w, 0.0) + a
    keep = sorted(sums, reverse=True)[:cap]
    assert buf.keys() == set(keep)
    for w in buf:
        assert abs(buf[w] - sums[w]) < 1e-9
