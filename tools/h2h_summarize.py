"""Summarize head-to-head results.jsonl into the BASELINE.md parity table.

Groups records by (mode, framework), reports per-group mean +- sd / SEM for
ALE (overall + difficulty-stratified), ALP, matched recall, RALP columns, and
the cross-framework delta with its standard error (Welch). Usage:

    python tools/h2h_summarize.py [/tmp/h2h/results_r3.jsonl]
"""

import json
import math
import sys
from collections import defaultdict


def stats(xs):
    # the reference evaluator emits -1.0 as an empty-cluster sentinel
    xs = [x for x in xs if x is not None and x >= 0]
    if not xs:
        return None
    n = len(xs)
    mean = sum(xs) / n
    sd = math.sqrt(sum((x - mean) ** 2 for x in xs) / (n - 1)) if n > 1 else 0.0
    return dict(n=n, mean=mean, sd=sd, sem=sd / math.sqrt(n) if n > 1 else None,
                lo=min(xs), hi=max(xs))


def welch_delta(a, b):
    """b - a with its SE (a=reference, b=tpu).

    With a single seed on one side (sem None) the Welch SE degenerates; fall
    back to the other side's per-seed sd as the spread estimate for BOTH sides
    (both frameworks train the same data volume, so seed noise is comparable) —
    marked approximate in the output.
    """
    if not a or not b:
        return None
    approx = False
    sa, sb = a['sem'], b['sem']
    if sa is None and sb is None:
        return None
    # borrow a spread estimate only from a side that actually has one (n>1);
    # an n==1 side's sd is a placeholder 0.0, not a measurement
    if sa is None:
        sa = (b['sd'] / math.sqrt(a['n'])) if b['n'] > 1 else None
        approx = True
    if sb is None:
        sb = (a['sd'] / math.sqrt(b['n'])) if a['n'] > 1 else None
        approx = True
    if sa is None or sb is None:
        return None
    se = math.sqrt(sa ** 2 + sb ** 2)
    return dict(delta=b['mean'] - a['mean'], se=se, approx=approx,
                rel_pct=(100.0 * (b['mean'] - a['mean']) / a['mean'])
                if a['mean'] else None)


def fmt(s, scale=1.0, digits=3):
    if s is None:
        return 'n/a'
    out = f"{s['mean'] * scale:.{digits}f}"
    if s['sem'] is not None:
        out += f" ± {s['sem'] * scale:.{digits}f}"
    return out


def main():
    paths = [a for a in sys.argv[1:] if not a.startswith('-')]
    if not paths:
        paths = ['/tmp/h2h/results_r3.jsonl']
    groups = defaultdict(list)
    seen = {}
    for path in paths:
        for line in open(path):
            r = json.loads(line)
            # Results accumulate across per-round jsonl files; pool every
            # path given, deduping re-recorded legs (same framework, mode,
            # seed, config) so overlapping snapshots don't double-count.
            # Precision-ablation legs (e.g. the round-4 f32-pinned set)
            # carry a 'precision' field: same seed, same data, DIFFERENT
            # trained weights — a distinct group, not a duplicate.
            prec = r.get('precision') or 'bf16'
            key = (r['framework'], r['mode'], r.get('r_seed'),
                   r.get('n_train'), r.get('n_val'), r.get('hard'), prec)
            if key in seen:
                # First occurrence wins, but a CONFLICTING re-record (e.g. a
                # leg re-measured after an eval fix) must not be dropped
                # silently — the pooled table would stand on the stale row.
                if r.get('ale') != seen[key].get('ale'):
                    print(f"WARNING: duplicate leg {key} in {path} has a "
                          f"DIFFERENT ale payload than the first occurrence "
                          f"(kept: ale_all={seen[key]['ale']['all']:.4f}, "
                          f"dropped: ale_all={r['ale']['all']:.4f}) — if the "
                          f"later row is a corrected re-measurement, remove "
                          f"the stale one from its file.", file=sys.stderr)
                continue
            seen[key] = r
            fw_label = (r['framework'] if prec == 'bf16'
                        else f"{r['framework']} [{prec}]")
            groups[(r['mode'], fw_label)].append(r)

    for mode in ('mono', 'stereo'):
        print(f"\n=== {mode} ===")
        gstats = {}
        extra_fws = sorted(fw for (m, fw) in groups
                           if m == mode and fw not in ('reference',
                                                       'monoloco_tpu'))
        for fw in ('reference', 'monoloco_tpu', *extra_fws):
            recs = groups.get((mode, fw), [])
            if not recs:
                continue
            # Per-seed records are only poolable if they were measured on the
            # SAME dataset (n_train, n_val, hard) — refuse to average across
            # configs silently (a stray differently-scaled leg would bias
            # every mean in the parity table).
            configs = {(r['n_train'], r['n_val'], r['hard']) for r in recs}
            if len(configs) > 1:
                raise SystemExit(
                    f"mixed dataset configs in ({mode}, {fw}): {sorted(configs)}"
                    " — filter the results file to one config before summarizing")
            g = {}
            g['ale_all'] = stats([r['ale']['all'] for r in recs])
            for d in ('easy', 'moderate', 'hard'):
                g[f'ale_{d}'] = stats([r['ale'].get(d) for r in recs])
            g['alp05'] = stats([r['alp']['<0.5m'] for r in recs])
            g['alp1'] = stats([r['alp']['<1m'] for r in recs])
            g['matched'] = stats([r['matched'] for r in recs])
            g['wall'] = stats([r['train_wall_s'] for r in recs])
            for param in ('detection', 'detection_5%', 'detection_10%'):
                g[f'ralp_{param}'] = stats(
                    [(r.get('ralp') or {}).get(param, {}).get('all') for r in recs])
                g[f'ralp_{param}_mod'] = stats(
                    [(r.get('ralp') or {}).get(param, {}).get('moderate') for r in recs])
            gstats[fw] = g
            n = g['ale_all']['n'] if g['ale_all'] else 0
            print(f"\n{fw} ({n} seeds; n_train={recs[0]['n_train']}, "
                  f"n_val={recs[0]['n_val']}, hard={recs[0]['hard']})")
            rng = (f" [{g['ale_all']['lo']:.3f}-{g['ale_all']['hi']:.3f}]"
                   if g['ale_all'] else '')
            print(f"  ALE all     : {fmt(g['ale_all'])} m{rng}")
            for d in ('easy', 'moderate', 'hard'):
                print(f"  ALE {d:<8}: {fmt(g[f'ale_{d}'])} m")
            print(f"  ALP <0.5m   : {fmt(g['alp05'], digits=2)} %   "
                  f"<1m: {fmt(g['alp1'], digits=2)} %")
            print(f"  matched     : {fmt(g['matched'], digits=1)}")
            print(f"  RALP det    : {fmt(g['ralp_detection'], digits=2)} "
                  f"(mod {fmt(g['ralp_detection_mod'], digits=2)})")
            print(f"  RALP-5%     : {fmt(g['ralp_detection_5%'], digits=2)} "
                  f"(mod {fmt(g['ralp_detection_5%_mod'], digits=2)})")
            print(f"  RALP-10%    : {fmt(g['ralp_detection_10%'], digits=2)} "
                  f"(mod {fmt(g['ralp_detection_10%_mod'], digits=2)})")
            print(f"  train wall  : {fmt(g['wall'], digits=0)} s")

        if 'reference' in gstats and 'monoloco_tpu' in gstats:
            print("\ndeltas (tpu - reference):")
            for key, label, digits in (
                    ('ale_all', 'ALE all [m]', 4),
                    ('ale_easy', 'ALE easy [m]', 4),
                    ('ale_moderate', 'ALE moderate [m]', 4),
                    ('ale_hard', 'ALE hard [m]', 4),
                    ('alp05', 'ALP<0.5m [pp]', 2),
                    ('ralp_detection_5%', 'RALP-5% [pp]', 2),
                    ('ralp_detection_10%', 'RALP-10% [pp]', 2)):
                d = welch_delta(gstats['reference'].get(key),
                                gstats['monoloco_tpu'].get(key))
                if d is None:
                    print(f"  {label:<18}: n/a")
                    continue
                z = d['delta'] / d['se'] if d['se'] else float('nan')
                mark = ' (approx SE: single-seed side)' if d.get('approx') else ''
                rel = f"{d['rel_pct']:+.2f}%" if d['rel_pct'] is not None else 'n/a'
                print(f"  {label:<18}: {d['delta']:+.{digits}f} ± {d['se']:.{digits}f}"
                      f"  ({rel}, {z:+.2f} SE){mark}")

        if '--md' in sys.argv:
            print(f"\nmarkdown rows ({mode}):")
            for fw, tag in (('reference', 'reference'),
                            ('monoloco_tpu', '**monoloco_tpu**')):
                g = gstats.get(fw)
                if not g:
                    continue
                def m(key, digits=3, scale=1.0):
                    s = g.get(key)
                    return 'n/a' if s is None else f"{s['mean'] * scale:.{digits}f}"
                s_all = g['ale_all'] or {'n': 0, 'sd': None}
                ale = (f"{m('ale_all')} ± {s_all['sd']:.3f}"
                       if s_all['n'] > 1 and s_all['sd'] is not None
                       else m('ale_all'))
                print(f"| {mode} | {tag} | {s_all['n']} | {ale} | "
                      f"{m('ale_easy')} / {m('ale_moderate')} / {m('ale_hard')} | "
                      f"{m('alp05', 2)}% | {m('matched', 0)} every leg | "
                      f"{m('ralp_detection', 2)} / {m('ralp_detection_5%', 2)} / "
                      f"{m('ralp_detection_10%', 2)} | {m('wall', 0)} s |")


if __name__ == '__main__':
    main()
