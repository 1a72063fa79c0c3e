"""Parse a sweep log (scripts/run_sweep_r2.sh output) and rank knob combos
per resolution, flagging checksum/hit-count disagreements (any combo must
be bit-identical -- a differing checksum means a correctness bug, not a
tuning choice). Prints the TUNED_BY_RES entries to paste into
ops/hako_kernels.py.

With --apply, rewrites the TUNED_BY_RES block in ops/hako_kernels.py in
place (between the _BEGIN/_END markers) with each resolution's best
measured combo, so an unattended sweep feeds the round-end bench.
Resolutions whose combos disagree on checksum/hits are SKIPPED (their
existing entry is kept): a checksum split means a correctness bug and no
timing from that batch can be trusted. Entries for resolutions absent
from the log are preserved.

With --apply-pt, does the same for the TUNED_PT_BY_RES overlay from the
`[pt] ...` stage lines (scripts/pt_step_timing.py): fastest s/step per
resolution wins, resolutions whose runs disagree on mean radiance are
skipped (PT knob changes are bit-exact by design -- a drifting mean is a
correctness bug). PT winner dicts are written in FULL (overlay semantics:
a partial dict would inherit base-table knobs the run never measured).

Usage: python scripts/pick_knobs.py [/tmp/sweep_r2.log] [--apply] [--apply-pt]
"""

import os
import re
import sys
from collections import defaultdict

PAT = re.compile(
    r"RES=(\d+) CAPD=(\d+) PACKD=(\d+) P=(\d+) D=(\d+) UNIQ=(\d+)"
    r"(?: TWOB=(\d+))?(?: VACP=(\d+) VACR=(\d+))?: "
    r"([0-9.]+) ms = ([0-9.]+) Mrays/s "
    r"checksum=([-0-9.einf]+) hits=(\d+)"
)


PT_PAT = re.compile(
    r"\[pt\] accel=hako res=(\d+)(?: scene=\w+)? \d+x\d+ 16spp: "
    r"([0-9.]+) s/step \(first [0-9.]+s\) mean=([-0-9.e+]+) "
    r"knobs\[([^\]]*)\]"
)

KERNELS_PY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "massivevoxelraytracing_tpu", "ops", "hako_kernels.py",
)
BEGIN = "# TUNED_BY_RES_BEGIN"
END = "# TUNED_BY_RES_END"
PT_BEGIN = "# TUNED_PT_BY_RES_BEGIN"
PT_END = "# TUNED_PT_BY_RES_END"
ARG_TO_KNOB = dict(
    cap_div="CAP_DIV", pack_div="PACK_DIV", uniq="UNIQ",
    two_brick="TWO_BRICK", max_probes="MAX_PROBES", max_dda="MAX_DDA_ITERS",
    vac_pick="VAC_PICK", vac_run="VAC_RUN",
)


def _winner_dict(best):
    out = dict(
        CAP_DIV=best["capd"], PACK_DIV=best["packd"], UNIQ=best["uniq"],
        TWO_BRICK=best["twob"], MAX_PROBES=best["p"],
        MAX_DDA_ITERS=best["d"],
    )
    if best.get("vacp"):  # vacuum off (0) stays implicit: old logs and the
        out["VAC_PICK"] = best["vacp"]       # factory default agree on it
        out["VAC_RUN"] = best.get("vacr", 2)
    return out


def entry_line(best):
    body = ", ".join(f"{k}={v}" for k, v in _winner_dict(best).items())
    return f"dict({body})"


def _rewrite_table(var, begin, end, new_entries, tags):
    """Merge {res: knobdict} into the marked table block in hako_kernels.py.

    Existing entries for resolutions not in new_entries survive: the
    current block is eval'd (it is a plain dict literal; comments are
    legal inside the braces) and merged."""
    src = open(KERNELS_PY).read()
    b, e = src.index(begin), src.index(end)
    head = src[: src.index("\n", b) + 1]  # everything through the BEGIN line
    block = src[src.index("\n", b) + 1 : e]
    table = eval(block.split("=", 1)[1], {"dict": dict})
    table = {r: dict(v) for r, v in table.items()}
    table.update(new_entries)
    lines = [f"{var} = {{"]
    for res in sorted(table):
        tag = tags.get(res, "")
        body = ", ".join(f"{k}={v}" for k, v in table[res].items()) or ""
        lines.append(f"    {res}: dict({body}),{tag}")
    lines.append("}")
    new = head + "\n".join(lines) + "\n" + src[e:]
    open(KERNELS_PY, "w").write(new)
    print(f"[apply] wrote {len(new_entries)} winner(s) into {var} "
          f"({KERNELS_PY})")


def apply_winners(winners):
    """winners: {res: (best_row, mrays)} from the cap_sweep batches."""
    _rewrite_table(
        "TUNED_BY_RES", BEGIN, END,
        {res: _winner_dict(best) for res, (best, _) in winners.items()},
        {res: f"  # {mrays:.1f} Mrays/s (sweep-applied)"
         for res, (_, mrays) in winners.items()},
    )


def pt_rows(path):
    """{res: [(s_per_step, mean_str, {KNOB: val})]} from [pt] stage lines."""
    rows = defaultdict(list)
    for line in open(path):
        m = PT_PAT.search(line)
        if not m:
            continue
        res, dt, mean, kstr = (int(m.group(1)), float(m.group(2)),
                               m.group(3), m.group(4))
        knobs = {}
        for tok in kstr.split():
            arg, val = tok.split("=")
            knobs[ARG_TO_KNOB[arg]] = int(val)
        rows[res].append((dt, mean, knobs))
    return rows


def apply_pt_winners(path):
    rows = pt_rows(path)
    winners, tags = {}, {}
    for res, rs in sorted(rows.items()):
        for dt, mean, knobs in sorted(rs):
            body = " ".join(f"{k}={v}" for k, v in sorted(knobs.items()))
            print(f"PT RES={res}: {dt:7.3f} s/step  mean={mean}  {body}")
        means = {mean for _, mean, _ in rs}
        if len(means) > 1:
            print(f"PT RES={res}: !! MEAN DISAGREEMENT across runs: {means}")
            continue
        dt, _, knobs = min(rs)
        winners[res] = knobs          # FULL dict: overlay must pin every knob
        tags[res] = f"  # {dt:.3f} s/step (sweep-applied)"
    if winners:
        _rewrite_table("TUNED_PT_BY_RES", PT_BEGIN, PT_END, winners, tags)
    else:
        print("[apply-pt] no clean PT resolutions in the log; nothing written")


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_apply = "--apply" in sys.argv[1:]
    do_apply_pt = "--apply-pt" in sys.argv[1:]
    path = argv[0] if argv else "/tmp/sweep_r2.log"
    if do_apply_pt:
        apply_pt_winners(path)
        if not do_apply:
            return
    rows = defaultdict(list)
    for line in open(path):
        m = PAT.search(line)
        if not m:
            continue
        res, capd, packd, p, d, uniq = (int(m.group(i)) for i in range(1, 7))
        twob = int(m.group(7) or 0)
        vacp, vacr = int(m.group(8) or 0), int(m.group(9) or 2)
        ms, mrays = float(m.group(10)), float(m.group(11))
        csum, hits = m.group(12), int(m.group(13))
        rows[res].append(dict(capd=capd, packd=packd, p=p, d=d, uniq=uniq,
                              twob=twob, vacp=vacp, vacr=vacr, ms=ms,
                              mrays=mrays, csum=csum, hits=hits))
    winners = {}
    for res in sorted(rows):
        rs = rows[res]
        csums = {(r["csum"], r["hits"]) for r in rs}
        if len(csums) > 1:
            print(f"RES={res}: !! CHECKSUM DISAGREEMENT across combos: "
                  f"{csums}")
        else:
            best = max(rs, key=lambda r: r["mrays"])
            winners[res] = (best, best["mrays"])
        for r in sorted(rs, key=lambda r: -r["mrays"]):
            print(f"RES={res} capd={r['capd']} packd={r['packd']} "
                  f"uniq={r['uniq']} twob={r['twob']} p={r['p']} d={r['d']} "
                  f"vac={r['vacp']}/{r['vacr']}"
                  f": {r['ms']:8.1f} ms  {r['mrays']:6.1f} Mrays/s")
        best = max(rs, key=lambda r: r["mrays"])
        print(f"    {res}: {entry_line(best)},")
        print()
    if do_apply:
        if winners:
            apply_winners(winners)
        else:
            print("[apply] no clean resolutions in the log; nothing written")


if __name__ == "__main__":
    main()
