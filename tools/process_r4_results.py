"""Digest the r4 tunnel-recovery runner's outputs into decision tables.

The auto-runner (tools/tunnel_recovery_runner.sh) only COLLECTS numbers
into results/r4_tpu/; this tool turns them into the r4 measurement
queue's decisions (queue now drained, runbook deleted per its own last
line): per-cell banded speedups vs the 1.2x
adoption bar, the one-pass-VJP A/B vs its derived 28.7 ms bar
(benchmarks/dist_loss_roofline.py), the full-step banded A/B vs the
153.2 ms roofline ceiling, the headline vs 556.8 m/s, and the fast-recipe
seed table.  Read-only: prints findings + recommended actions, changes
nothing.

    python tools/process_r4_results.py [--dir results/r4_tpu]
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ADOPT_BAR = 1.2                 # established speedup bar for new forms
HEADLINE_MPS = 556.8            # r3 driver-comparable headline
ONEPASS_PRED_MS = 28.7          # derived step saving (dist_loss_roofline)
BANDED_STEP_PRED_MS = 153.2     # banded full-step ceiling (row_floor)
TAKE_STEP_MS = 229.9            # r3 achieved step at B=128
SEED_BAND_MM = (1.81, 0.15)     # paper final +- documented band


def _json_lines(path):
    out = []
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return out


def _bench_value(path):
    for rec in _json_lines(path):
        if rec.get("metric") == "train_meshes_per_sec_per_chip":
            return rec
    return None


def conv_decisions(recs):
    """Per-cell conv banding table; returns (lines, winners) where winners
    are (level, batch, dtype) cells at/above the bar."""
    lines, winners = [], []
    for r in recs:
        if "level" not in r or "take_ms" not in r or "op" in r:
            continue
        for key in sorted(r):
            if key.endswith("_fly_speedup"):
                band = key[: -len("_fly_speedup")]
                sp = r[key]
                err = r.get(f"{band}_err")
                verdict = "ADOPT" if sp >= ADOPT_BAR else "reject"
                if sp >= ADOPT_BAR:
                    winners.append((r["level"], r["batch"], r["dtype"]))
                lines.append(
                    f"conv L{r['level']} c{r['c_in']}->{r['c_out']} "
                    f"B={r['batch']} {r['dtype']}: take {r['take_ms']} ms, "
                    f"{band} {r[f'{band}_fly_ms']} ms = {sp}x "
                    f"(err {err:.2e}) -> {verdict}")
    return lines, winners


def sampling_decisions(recs):
    lines, winners = [], []
    for r in recs:
        if r.get("op") not in ("pool", "unpool"):
            continue
        sp = r["band_speedup"]
        verdict = "ADOPT" if sp >= ADOPT_BAR else "reject"
        if sp >= ADOPT_BAR:
            winners.append((r["op"], r["level"], r["batch"]))
        lines.append(
            f"{r['op']} L{r['level']} c{r['c']} B={r['batch']}: "
            f"take {r['take_ms']} ms, band {r['band_ms']} ms = {sp}x "
            f"(err {r['err']:.2e}, oob {r['oob_pct']}%) -> {verdict}")
    return lines, winners


def _step_ms(bench_rec, batch=128):
    return batch / bench_rec["value"] * 1e3


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.path.join(REPO, "results", "r4_tpu"))
    args = ap.parse_args(argv)
    d = args.dir

    print(f"== r4 recovery results in {d} ==\n")
    actions = []

    sanity = _bench_value(os.path.join(d, "sanity_bench.out"))
    if sanity:
        print(f"[1] sanity bench (B=8): {sanity['value']} {sanity['unit']}"
              f" (vs_baseline {sanity.get('vs_baseline')})")
    else:
        print("[1] sanity bench: no result yet")

    for tag, fname in (("bf16", "banded_probe_bf16.out"),
                       ("f32", "banded_probe_f32.out")):
        recs = _json_lines(os.path.join(d, fname))
        if not recs:
            print(f"[2] banded probe {tag}: no result yet")
            continue
        clines, cwin = conv_decisions(recs)
        slines, swin = sampling_decisions(recs)
        print(f"[2] banded probe {tag} ({len(recs)} cells):")
        for ln in clines + slines:
            print("   ", ln)
        if cwin:
            actions.append(
                f"banding wins ({tag}) at cells {sorted(set(cwin))}: set "
                "banded_conv=true for the matching regime (config default "
                "if broad; else add a batch/level gate in _banded_ok), "
                "record in docs/BENCHMARKS.md 'What won'")
        elif clines:
            actions.append(
                f"conv banding below the {ADOPT_BAR}x bar ({tag}): move "
                "docs/BENCHMARKS.md 'In flight' to 'Measured alternatives' "
                "with the numbers; keep the gate off")
        if swin:
            actions.append(
                f"pool/unpool banding wins ({tag}) at {sorted(set(swin))}: "
                "enable via the sampling band gates")

    dc_err = os.path.join(d, "dispatch_check.err")
    dc_out = os.path.join(d, "dispatch_check.out")
    if os.path.exists(dc_out):
        tail = open(dc_out).read().strip().splitlines()[-3:]
        print("[3] dispatch exactness check tail:", *tail, sep="\n    ")
        actions.append("if dispatch check passed (rc=0 in runner.log): "
                       "record the table in docs/BENCHMARKS.md — closes "
                       "VERDICT r3 weak #6")
    else:
        print("[3] dispatch check: no result yet")
    if os.path.exists(dc_err) and os.path.getsize(dc_err):
        print("    (stderr nonempty — inspect", dc_err, ")")

    off = _bench_value(os.path.join(d, "ab_onepass_off.out"))
    on = _bench_value(os.path.join(d, "ab_onepass_on.out"))
    if off and on:
        d_ms = _step_ms(off) - _step_ms(on)
        bar = ONEPASS_PRED_MS / ADOPT_BAR
        print(f"[5] one-pass VJP A/B: off {off['value']} -> on "
              f"{on['value']} m/s = {d_ms:+.1f} ms/step "
              f"(derived prediction {ONEPASS_PRED_MS}, adopt if >= "
              f"{bar:.1f})")
        if d_ms >= bar:
            actions.append("one-pass VJP at bar: flip the default in "
                           "part_dist_pallas._one_pass_grad, record in "
                           "docs/BENCHMARKS.md")
        else:
            actions.append(f"one-pass VJP below bar ({d_ms:+.1f} ms vs "
                           f"{bar:.1f}): record-and-reject with numbers")
    else:
        print("[5] one-pass A/B: incomplete")

    banded = _bench_value(os.path.join(d, "ab_banded_on.out"))
    if banded and off:
        print(f"[6] full-step banded A/B: take {off['value']} vs banded "
              f"{banded['value']} m/s (step {_step_ms(off):.1f} vs "
              f"{_step_ms(banded):.1f} ms; roofline ceiling "
              f"{BANDED_STEP_PRED_MS} ms)")
        if banded["value"] > off["value"] * 1.05:
            actions.append("full-step banding wins: adopt for the headline "
                           "(bench/__graft_entry__ overrides + config), "
                           "re-run bench.py for the final number")
    else:
        print("[6] full-step banded A/B: incomplete")

    full = _bench_value(os.path.join(d, "bench_full.out"))
    if full:
        print(f"[7] full headline bench: {full['value']} m/s "
              f"(r3: {HEADLINE_MPS}; driver BENCH_r04 target >= that)")
    else:
        print("[7] full headline bench: no result yet")

    lo, band = SEED_BAND_MM
    for seed in (5, 6):
        curve = os.path.join(REPO, "results", f"fast_seed{seed}",
                             "curve.jsonl")
        recs = _json_lines(curve)
        if recs:
            mm = recs[-1].get("mm")
            ok = abs(mm - lo) <= band
            print(f"[8] fast-recipe seed {seed}: final {mm} mm "
                  f"({'within' if ok else 'OUTSIDE'} {lo}+-{band})")
            actions.append(f"extend the seed table in docs/BENCHMARKS.md "
                           f"with seed {seed} = {mm} mm")
        else:
            print(f"[8] fast-recipe seed {seed}: no curve yet")

    # [9] extra on-the-fly banding cell at the trainer's interp batch
    # (f32, B=12, L1 only — queued to settle the f32 small-batch gate)
    extra = _json_lines(os.path.join(d, "f32_b12_L1.out"))
    if extra:
        clines, cwin = conv_decisions(extra)
        print(f"[9] f32 B=12 L1 banding cell ({len(extra)} cells):")
        for ln in clines:
            print("   ", ln)
        if cwin:
            actions.append(
                f"f32 B=12 banding at bar ({sorted(set(cwin))}): the "
                "small-batch conv gate generalizes to f32 — keep "
                "_BANDED_MAX_B dtype-independent")
    else:
        print("[9] f32 B=12 L1 cell: no result yet")

    # [10] banded paper-recipe epoch time (banded_conv default live)
    pb = os.path.join(d, "paper_banded.out")
    if os.path.exists(pb):
        epochs = [ln for ln in open(pb) if ln.startswith("epoch ")]
        secs = [float(ln.rsplit("|", 1)[1].strip().rstrip("s"))
                for ln in epochs[1:]]  # skip compile epoch
        curves = [json.loads(ln[len("CURVE "):]) for ln in open(pb)
                  if ln.startswith("CURVE ")]
        if secs:
            print(f"[10] banded paper recipe: steady-state "
                  f"{min(secs):.1f} s/epoch over {len(secs)} epochs"
                  + (f", final {curves[-1]['mm']} mm" if curves else ""))
            actions.append(
                "record the banded paper run (epoch time + final mm) in "
                "docs/BENCHMARKS.md; if the final sits outside the "
                "documented equivalence spread, re-run at N>=2 before "
                "keeping banded_conv as the config default")
    else:
        print("[10] banded paper recipe: no result yet")

    # [11] end-of-round driver bench (post-seed-runs confirmation)
    final = _bench_value(os.path.join(d, "bench_final.out"))
    if final:
        print(f"[11] final bench: {final['value']} m/s "
              f"(sweep {final.get('sweep_meshes_per_sec_by_batch')})")
    else:
        print("[11] final bench: no result yet")

    # [12] runner/queue logs: surface any non-zero rc
    for logname in ("runner.log", "queue2.log"):
        p = os.path.join(d, logname)
        if not os.path.exists(p):
            continue
        bad = [ln.strip() for ln in open(p)
               if " END " in ln and "rc=0" not in ln]
        status = "all rc=0" if not bad else f"FAILURES: {bad}"
        print(f"[12] {logname}: {status}")

    if actions:
        print("\n== recommended actions ==")
        for a in actions:
            print(" -", a)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
