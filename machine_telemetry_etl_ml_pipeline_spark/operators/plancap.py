"""Construction-time physical-plan capture (r7 verdict item 6).

Iterative operators execute most of their work DURING entry
construction — per-round `localCheckpoint(eager=True)` rotations and
bounded 1-row stats collects — so the frame they return is only the
residual tail of the plan and `tools/plan_audit.py`, which inspects
the returned handle, under-counted them (PLANS.md r7 carried two
hand-verified starred rows for exactly this reason).

This module restores the mechanical gate: `plan_audit` runs each
entry inside `capture()`, and the two driver-side execution points —
`ckpt.checkpoint_rotate` and the explicit `note()` calls at bounded
collect sites — record the FINALIZED executed plan of every
construction-time action (verified: after `localCheckpoint(eager=True)`
or `.collect()`, the original handle's `queryExecution().executedPlan()`
prints `isFinalPlan=true` with codegen markers). The audit then sums
shuffle/join/codegen counts over [captured plans] + [residual plan],
which is the work a timed run actually performs.

`note()` is a no-op unless a capture is active, so the hot path costs
one `is None` check per checkpoint rotation.
"""

from __future__ import annotations

from contextlib import contextmanager

_SINK: "list | None" = None


def note(df) -> None:
    """Record `df`'s finalized executed plan if a capture is active.
    Call AFTER the action (checkpoint/collect/count) has run on this
    handle — before that the adaptive plan is provisional."""
    global _SINK
    if _SINK is None:
        return
    try:
        _SINK.append(df._jdf.queryExecution().executedPlan().toString())
    except Exception:  # noqa: BLE001  (Connect sessions have no _jdf)
        pass


@contextmanager
def capture():
    """Collect construction-time plan strings from `note()` sites.
    Nesting restores the previous sink (captures don't merge)."""
    global _SINK
    prev, _SINK = _SINK, []
    try:
        yield _SINK
    finally:
        _SINK = prev
