"""Multi-process (DCN) frame-parallel demo: two real OS processes join a
jax.distributed coordinator, render disjoint frame ranges, and agree on a
cross-process all-reduced statistic (the jax.distributed form of the
reference's run.py two-machine split)."""

import os
import subprocess
import sys


def test_dcn_two_processes(tmp_path):
    port = 47200 + os.getpid() % 500
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # workers force their own platform
    cmd = [
        sys.executable, "-m", "massivevoxelraytracing_tpu.apps.dcn_frames",
        "--procs", "2", "--local-devices", "2", "--frames", "4",
        "--res", "32", "--width", "96", "--height", "64",
        "--coordinator", f"127.0.0.1:{port}",
        "--out", str(tmp_path / "frames"),
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("[dcn]")]
    assert line and "4 frames" in line[0], out.stdout[-2000:]
    # every frame rendered exactly once across the two processes
    pngs = sorted(os.listdir(tmp_path / "frames"))
    assert pngs == [f"{i:03d}.png" for i in range(4)]
