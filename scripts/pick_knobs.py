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

Usage: python scripts/pick_knobs.py [/tmp/sweep_r2.log] [--apply]
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


KERNELS_PY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "massivevoxelraytracing_tpu", "ops", "hako_kernels.py",
)
BEGIN = "# TUNED_BY_RES_BEGIN"
END = "# TUNED_BY_RES_END"


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


def apply_winners(winners):
    """Rewrite TUNED_BY_RES in hako_kernels.py with measured winners.

    winners: {res: (best_row, mrays)}. Existing entries for resolutions not
    in winners survive: the current block is eval'd (it is a plain dict
    literal; comments are legal inside the braces) and merged.
    """
    src = open(KERNELS_PY).read()
    b, e = src.index(BEGIN), src.index(END)
    head = src[: src.index("\n", b) + 1]  # everything through the BEGIN line
    block = src[src.index("\n", b) + 1 : e]
    table = eval(block.split("=", 1)[1], {"dict": dict})
    table = {r: dict(v) for r, v in table.items()}
    for res, (best, mrays) in winners.items():
        table[res] = _winner_dict(best)
    lines = ["TUNED_BY_RES = {"]
    for res in sorted(table):
        tag = ""
        if res in winners:
            tag = f"  # {winners[res][1]:.1f} Mrays/s (sweep-applied)"
        body = ", ".join(f"{k}={v}" for k, v in table[res].items()) or ""
        lines.append(f"    {res}: dict({body}),{tag}")
    lines.append("}")
    new = head + "\n".join(lines) + "\n" + src[e:]
    open(KERNELS_PY, "w").write(new)
    print(f"[apply] wrote {len(winners)} sweep winner(s) into {KERNELS_PY}")


def main():
    argv = [a for a in sys.argv[1:] if a != "--apply"]
    do_apply = "--apply" in sys.argv[1:]
    path = argv[0] if argv else "/tmp/sweep_r2.log"
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
