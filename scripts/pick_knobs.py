"""Parse a sweep log (scripts/run_sweep_r2.sh output) and rank knob combos
per resolution, flagging checksum/hit-count disagreements (any combo must
be bit-identical -- a differing checksum means a correctness bug, not a
tuning choice). Prints the TUNED_BY_RES entries to paste into
ops/hako_kernels.py.

Usage: python scripts/pick_knobs.py [/tmp/sweep_r2.log]
"""

import re
import sys
from collections import defaultdict

PAT = re.compile(
    r"RES=(\d+) CAPD=(\d+) PACKD=(\d+) P=(\d+) D=(\d+) UNIQ=(\d+)"
    r"(?: TWOB=(\d+))?: ([0-9.]+) ms = ([0-9.]+) Mrays/s "
    r"checksum=([-0-9.einf]+) hits=(\d+)"
)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep_r2.log"
    rows = defaultdict(list)
    for line in open(path):
        m = PAT.search(line)
        if not m:
            continue
        res, capd, packd, p, d, uniq = (int(m.group(i)) for i in range(1, 7))
        twob = int(m.group(7) or 0)
        ms, mrays = float(m.group(8)), float(m.group(9))
        csum, hits = m.group(10), int(m.group(11))
        rows[res].append(dict(capd=capd, packd=packd, p=p, d=d, uniq=uniq,
                              twob=twob, ms=ms, mrays=mrays, csum=csum,
                              hits=hits))
    for res in sorted(rows):
        rs = rows[res]
        csums = {(r["csum"], r["hits"]) for r in rs}
        if len(csums) > 1:
            print(f"RES={res}: !! CHECKSUM DISAGREEMENT across combos: "
                  f"{csums}")
        for r in sorted(rs, key=lambda r: -r["mrays"]):
            print(f"RES={res} capd={r['capd']} packd={r['packd']} "
                  f"uniq={r['uniq']} twob={r['twob']} p={r['p']} d={r['d']}"
                  f": {r['ms']:8.1f} ms  {r['mrays']:6.1f} Mrays/s")
        best = max(rs, key=lambda r: r["mrays"])
        print(
            f"    {res}: dict(CAP_DIV={best['capd']}, "
            f"PACK_DIV={best['packd']}, UNIQ={best['uniq']}, "
            f"TWO_BRICK={best['twob']}, MAX_PROBES={best['p']}, "
            f"MAX_DDA_ITERS={best['d']}),"
        )
        print()


if __name__ == "__main__":
    main()
