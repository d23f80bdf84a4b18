"""Shared capacity-sizing constants for the 1M bench and its profiler.

One importable home so ``bench.py`` and ``tools/profile_step.py`` cannot
drift apart: the profiler's stage deltas only sum to the bench step time
when both run the exact same shapes.
"""

# Raw emission slots per object (~15.7 measured at the 1M density-1/1000
# scene; 46% are duplicate emissions of multi-cell pairs).
EMIT_SLACK = 16

# Unique pairs per object (8.53 measured, deterministic scene).  The
# emit-once rule guarantees the pair buffer only ever holds unique pairs,
# so 9 leaves 5.5% headroom; overflow is flagged in the bench JSON record
# and fails BROADPHASE_VERIFY.
#
# WIDE-ID REGIME (ids >= 2^24, VERDICT r4 #5): the emit-once rule is
# unavailable, the scan degrades to keep-all, and the PAIR buffer must be
# sized for RAW emissions — EMIT_SLACK (15.72/object measured at 1M),
# not PAIR_SLACK.  Ids >= 2^20 additionally disable the packed pair sort
# and the two-column tree-sort tier; ids >= 2^29 drop aux entirely.  The
# bench measures this regime as full_step_1M_wide_p50_ms (18x slack at
# 1M; 40x for small scenes, whose relatively larger boxes emit more).
PAIR_SLACK = 9

# Tree cells per object (3.28 measured) + ~12% headroom.
def tree_capacity(n: int) -> int:
    return ((max(1, (37 * n) // 10) // 1024) + 1) * 1024


def pair_capacity(n: int, slack: int = PAIR_SLACK) -> int:
    return ((slack * n) // 1024) * 1024


def update_caps(n: int, churn_frac: float) -> tuple:
    """(churn_cap, obj_cap) for the update() bench at a given cross-cell
    churn fraction.  A churned object tombstones ALL its old cells and
    inserts all its new ones (~3.3 avg, measured: tree_count/n), so the
    per-side slot budget is 4x the churned objects + headroom; obj_cap
    carries ~30% headroom over the exact churned-object count.  Both are
    static shapes: the bench compiles one executable per sweep point."""
    objs = max(64, int(n * churn_frac))
    # worst case: every moving object occupies the full 8-cell block on
    # both sides (r4 used the same 8.2x sizing at 3%)
    churn_cap = ((8 * objs + objs // 4) // 1024 + 1) * 1024
    obj_cap = ((objs + (3 * objs) // 10) // 1024 + 1) * 1024
    return churn_cap, obj_cap


def emit_capacity(n: int, slack: int = EMIT_SLACK) -> int:
    return ((slack * n) // 1024) * 1024
