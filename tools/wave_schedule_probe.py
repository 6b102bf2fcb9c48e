"""Host-side wave-schedule cost model: overshoot of static prefix ladders.

The paint wave fold processes all tiles of a static prefix for every k step
in the wave's range, so tiles shallower than the wave's end pay dead steps.
This probe measures that overshoot (schedule tile-steps / sum of depths)
for geometric ladders, hand ladders, and a DP-optimal static ladder, across
paris-like and adversarial depth distributions — pure numpy, no chip time.

Findings (recorded in docs/ARCHITECTURE.md): the default geometric (4,256)
overshoots ~1.44x on paris-like depths; shrink=2 gets 1.28x (6 waves); a
DP-derived 4-wave fractional ladder (1, .38, .17, .09) gets ~1.24x on paris
but degrades to ~2.9x on sparse scenes — no fixed ladder is robust, so
candidates are exposed via FORMA_WAVE for committed-state A/Bs instead of
changing the default.

Usage: python tools/wave_schedule_probe.py
"""

from __future__ import annotations

import numpy as np


def paris_depths(seed, rows=68, tiles_x=120, roads=12, lam=30.0):
    rng = np.random.default_rng(seed)
    t = rows * tiles_x
    depth = rng.poisson(lam, t).astype(np.int64)
    for _ in range(roads):
        r0 = rng.integers(0, rows)
        for c in range(tiles_x):
            r = int(np.clip(r0 + rng.integers(-1, 2), 0, rows - 1))
            depth[r * tiles_x + c] += int(rng.integers(100, 220))
    return np.clip(depth, 0, 250)


def ladder_cost(d, fracs):
    """Tile-steps of a static ladder given as prefix-size fractions of n
    (adaptive bounds, as ops/paint.py computes them)."""
    d = np.sort(d)[::-1].astype(np.int64)
    n = len(d)
    sizes = sorted(
        {max(1, min(n, int(-(-f * n // 1)))) for f in fracs} | {n},
        reverse=True,
    )
    b = [0] + [int(d[s]) if s < n else 0 for s in sizes[1:]] + [int(d[0])]
    return (
        sum(p * max(b[i + 1] - b[i], 0) for i, p in enumerate(sizes)),
        int(d.sum()),
        len(sizes),
    )


def geo_fracs(n, shrink, floor):
    sizes = [n]
    while sizes[-1] > floor:
        sizes.append(max(sizes[-1] // shrink, floor))
    return [s / n for s in sizes]


def optimal_ladder(d, waves):
    """DP over distinct-depth cut candidates: optimal static prefix sizes."""
    d = np.sort(d)[::-1].astype(np.int64)
    n = len(d)
    bnd = np.flatnonzero(np.diff(d) != 0) + 1
    cands = np.unique(np.concatenate([[0], bnd, [n]]))
    dep = np.where(cands == n, 0, d[np.minimum(cands, n - 1)])
    m = len(cands)
    INF = 1 << 60
    dp = np.full(m, INF, np.int64)
    dp[0] = 0
    par = np.zeros((waves, m), np.int32)
    for w in range(waves):
        ndp = np.full(m, INF, np.int64)
        for j in range(1, m):
            costs = dp[:j] + cands[j] * (dep[:j] - dep[j])
            i = int(np.argmin(costs))
            ndp[j] = costs[i]
            par[w, j] = i
        dp = ndp
    cuts = [m - 1]
    for w in range(waves - 1, -1, -1):
        cuts.append(int(par[w, cuts[-1]]))
    return int(dp[-1]), [c / n for c in cands[cuts[::-1]]]


def main():
    n = 68 * 120
    cand = {
        "geo 4,256 (default)": geo_fracs(n, 4, 256),
        "geo 2,256": geo_fracs(n, 2, 256),
        "dp4 paris (1,.38,.17,.09)": [1, 0.38, 0.17, 0.09],
        "dp4+tail (.., .03)": [1, 0.38, 0.17, 0.09, 0.03],
    }
    shapes = {
        "paris-like": dict(),
        "dense roads (24)": dict(roads=24),
        "sparse (2 roads, lam 4)": dict(roads=2, lam=4.0),
        "uniform (no roads)": dict(roads=0),
    }
    for sname, kw in shapes.items():
        print(f"== {sname} ==")
        for name, fr in cand.items():
            rs = [ladder_cost(paris_depths(s, **kw), fr) for s in range(4)]
            over = np.mean([c / i for c, i, _ in rs])
            print(f"  {name:28s} overshoot {over:5.2f}x  waves={rs[0][2]}")
    c, fr = optimal_ladder(paris_depths(0), 4)
    ideal = int(paris_depths(0).sum())
    print(
        f"DP-optimal 4-wave on paris seed 0: {c / ideal:.2f}x, "
        f"fractions {[round(f, 3) for f in fr]}"
    )


if __name__ == "__main__":
    main()
