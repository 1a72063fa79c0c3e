"""Multi-process (DCN) frame-parallel rendering demo.

The reference's only multi-machine story is run.py: two SSH'd instances
rendering disjoint frame ranges with no communication
(/root/reference/usecase2_submission/run.py:1-33). This is its
jax.distributed form: N OS processes join one coordinator, each renders
its frame range on its local devices (frame data parallelism -- the DCN
axis), and the job-level statistics ride REAL cross-process collectives
(a psum over the global device mesh) instead of being pasted together by
hand. On a TPU pod each process would own one host's chips; here the
demo runs anywhere by forcing the CPU platform with virtual devices.

Run (single machine, 2 processes):
  python -m massivevoxelraytracing_tpu.apps.dcn_frames --procs 2 --frames 4
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np


def worker(args):
    # force the virtual-CPU platform BEFORE jax import (sitecustomize pins
    # the tunneled TPU; a pod deployment would drop these three lines)
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    ]
    flags.append(
        f"--xla_force_host_platform_device_count={args.local_devices}"
    )
    os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.procs,
        process_id=args.process_id,
    )
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from ..models import raycast, scene
    from ..ops import camera as camera_ops
    from ..utils import meshgen
    from .launch_frames import partition
    from .scenes import animated_scene

    n_dev = len(jax.devices())
    assert n_dev == args.procs * args.local_devices
    pid = args.process_id
    mesh = Mesh(np.asarray(jax.devices()).reshape(n_dev), ("dp",))

    @jax.jit
    def reduce(x):
        return jnp.sum(x, axis=0)

    def global_reduce(local_sum, n_rendered):
        row = np.asarray(
            [[local_sum / args.local_devices,
              n_rendered / args.local_devices]], np.float32
        )
        garr = jax.make_array_from_single_device_arrays(
            (n_dev, 2),
            jax.sharding.NamedSharding(mesh, P("dp")),
            [jax.device_put(row, d) for d in jax.local_devices()],
        )
        # jnp.sum over the dp-sharded global array lowers to a cross-process
        # all-reduce; the result is replicated, so every process reads it
        # from its first addressable shard
        return np.asarray(reduce(garr).addressable_data(0))

    # establish the cross-process Gloo context NOW, while all processes are
    # within seconds of each other -- deferring the first collective until
    # after per-process render compiles lets the faster process hit the
    # 30 s connect timeout while the slower one is still compiling
    global_reduce(0.0, 0)

    # frame data parallelism over DCN: each process owns a contiguous range
    begin, end = partition(args.frames, args.procs)[pid]
    local_sum = 0.0
    n_rendered = 0
    for frame in range(begin, end):
        tri, col, emi = animated_scene(args.scene, frame, args.frames)
        origin, dps = meshgen.fit_grid(tri, args.res)
        tree = scene.build_scene(
            tri, col, emi, origin=origin, dps=dps, grid_res=args.res,
            accel="brick",
        )
        center = np.asarray(origin) + 0.5 * float(dps) * args.res
        cam = camera_ops.Camera.look_at(
            eye=center + np.array([0.8, 0.5, 1.5]) * float(dps) * args.res,
            target=center, fovy_deg=40.0,
        )
        img, depth = raycast.render_frame(tree, cam, args.width, args.height)
        local_sum += float(jnp.sum(jnp.where(depth < 1e37, depth, 0.0)))
        n_rendered += 1
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            from ..utils import png

            png.write(
                os.path.join(args.out, f"{frame:03d}.png"), np.asarray(img)
            )

    # job statistics over a REAL cross-process collective: psum over the
    # GLOBAL mesh (every process contributes its shard; the result is
    # identical on all hosts)
    total = global_reduce(local_sum, n_rendered)
    if pid == 0:
        print(
            f"[dcn] {args.procs} processes x {args.local_devices} devices: "
            f"{int(round(float(total[1])))} frames, depth-checksum "
            f"{float(total[0]):.4f}",
            flush=True,
        )
    jax.distributed.shutdown()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--scene", default="bumpy")
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=100)
    ap.add_argument("--coordinator", default="127.0.0.1:47013")
    ap.add_argument("--out", default=None)
    ap.add_argument("--process-id", type=int, default=None,
                    help="internal: set for spawned workers")
    args = ap.parse_args(argv)

    if args.process_id is not None:
        worker(args)
        return

    procs = []
    for pid in range(args.procs):
        cmd = [sys.executable, "-m",
               "massivevoxelraytracing_tpu.apps.dcn_frames",
               "--process-id", str(pid)]
        for k in ("procs", "local_devices", "frames", "res", "width",
                  "height"):
            cmd += [f"--{k.replace('_', '-')}", str(getattr(args, k))]
        cmd += ["--scene", args.scene, "--coordinator", args.coordinator]
        if args.out:
            cmd += ["--out", args.out]
        procs.append(subprocess.Popen(cmd))
    rc = [p.wait() for p in procs]
    if any(rc):
        raise SystemExit(f"worker exit codes: {rc}")


if __name__ == "__main__":
    main()
