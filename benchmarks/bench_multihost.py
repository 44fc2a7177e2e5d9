"""Multi-host scaling benchmark harness (BASELINE.md north star: >= 85%
rays/s efficiency at >= 2 hosts).

Weak scaling: every host renders the SAME amount of work (pixels x
samples on the standard Cornell load), so efficiency(N) =
rays_per_s(N hosts) / (N * rays_per_s(1 host)). The forward pass is
embarrassingly parallel over the dp (pixel-tile) axis — inefficiency
measures collective/dispatch overhead of the sp sample-psum and the
cross-host film gather, exactly what a pod deployment pays.

Modes:
  python benchmarks/bench_multihost.py
      CPU plumbing rig (no TPU pod in this environment): spawns 1- and
      2-process jax.distributed groups, 4 virtual devices each, over the
      REAL multi-process code path (tracer/dist/multihost.py), and prints
      one JSON line with the measured efficiency. Numbers validate the
      harness + collectives, not TPU silicon.

  python benchmarks/bench_multihost.py --real
      On an actual pod slice: launch one process per host with
      JAX_COORDINATOR / JAX_NUM_PROCESSES / JAX_PROCESS_ID set (any
      per-host launcher); each process measures its shard and process 0
      prints the JSON. Record the 1-host run first for the denominator:
      the tool prints raw rays/s either way.

Reference: the CPU ancestor has no distribution at all — its parallel
runtime is one std::thread per scanline (/root/reference/main.cpp:229-238)
and its only timing is a per-run wall estimate (main.cpp:248-249).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

PIX_PER_DP = 4096     # weak-scaling work unit (pixels per dp shard)
SPP = 4
REPS = 3


def measure(mesh, label: str):
    """rays/s of render_pixels_sharded on Cornell with PIX_PER_DP pixels
    per dp shard (run inside an initialized process group)."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from tracer.core.config import RenderConfig
    from tracer.dist import multihost as mh
    from tracer.dist.sharding import render_pixels_sharded
    from tracer.render.camera import default_camera
    from tracer.scene.device import compile_scene
    from tracer.scenes import zoo

    W, H = 850, 480
    cfg = RenderConfig(width=W, height=H, nsamples=SPP, max_bounces=6)
    scene = compile_scene(zoo.setup_cornell_box(W / H))
    cam = default_camera(aspect=W / H)

    n_dp = mesh.shape["dp"]
    n = n_dp * PIX_PER_DP
    pids = (np.arange(n, dtype=np.int32) * 977) % (W * H)
    g_pids = mh.global_pixel_array(pids, mesh)
    scene_r, cam_r = mh.replicate((scene, cam), mesh)
    base_key = jax.random.key(0)

    f = jax.jit(lambda s, c, p: jnp.sum(render_pixels_sharded(
        s, c, cfg, W, H, p, SPP, base_key, mesh)))

    def run():
        v = f(scene_r, cam_r, g_pids)
        # the only honest sync under this environment's TPU tunnel is a
        # host fetch; for multi-process global arrays fetch the local
        # addressable shard sum
        return float(np.asarray(
            [np.asarray(s.data).sum() for s in v.addressable_shards]).sum())

    t0 = time.perf_counter()
    run()  # compile + first run
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        run()
    dt = (time.perf_counter() - t0) / REPS
    rays = n * SPP
    return {"label": label, "hosts": jax.process_count(),
            "devices": len(jax.devices()), "pixels": int(n), "spp": SPP,
            "rays_per_s": round(rays / dt),
            "wall_s": round(dt, 4),
            "compile_s": round(t_compile, 2)}


def worker(pid: int, nprocs: int, port: int, out_path: str,
           mode: str = "dist"):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")
    if mode == "indep":
        # CONTROL for the rig-gap decomposition: same per-host work,
        # same 4-device local mesh, but NO process group — measures pure
        # CPU oversubscription when both rig "hosts" share the box,
        # without any distributed runtime in the loop
        from tracer.dist.sharding import make_ray_mesh
        mesh = make_ray_mesh(n_dp=2, n_sp=2)
        res = measure(mesh, f"cpu-rig-{nprocs}proc-indep")
        with open(f"{out_path}.{pid}", "w") as f:
            json.dump(res, f)
        return
    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs, process_id=pid)
    from tracer.dist import multihost as mh
    mesh = mh.make_pod_mesh(n_sp=2)
    res = measure(mesh, f"cpu-rig-{nprocs}proc")
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(res, f)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def driver():
    """Spawn 1-process and 2-process groups (plus a 2-process
    INDEPENDENT control with no distributed runtime); report weak-scaling
    efficiency and the rig-gap decomposition."""
    results = {}
    for nprocs, mode in ((1, "dist"), (2, "dist"), (2, "indep")):
        port = _free_port()
        out = f"/tmp/bench_mh_{port}.json"
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["XLA_FLAGS"] = ""
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tracer-jax-cache")
        procs = [subprocess.Popen(
            [sys.executable, __file__, "--worker", str(i), str(nprocs),
             str(port), out, mode], env=env)
            for i in range(nprocs)]
        for p in procs:
            p.wait(timeout=1800)
            assert p.returncode == 0, f"worker failed rc={p.returncode}"
        if mode == "indep":
            # same total work, slowest process bounds the wall
            rs = []
            for i in range(nprocs):
                with open(f"{out}.{i}") as f:
                    rs.append(json.load(f))
                os.remove(f"{out}.{i}")
            wall = max(r["wall_s"] for r in rs)
            results["indep"] = {
                "label": rs[0]["label"], "wall_s": wall,
                "rays_per_s": round(sum(r["pixels"] * r["spp"]
                                        for r in rs) / wall)}
        else:
            with open(out) as f:
                results[nprocs] = json.load(f)
            os.remove(out)
    r1, r2, ri = results[1], results[2], results["indep"]
    eff = r2["rays_per_s"] / (2.0 * r1["rays_per_s"])
    eff_indep = ri["rays_per_s"] / (2.0 * r1["rays_per_s"])
    print(json.dumps({
        "metric": "multihost_weak_scaling_efficiency",
        "value": round(eff, 4),
        "unit": "fraction (1.0 = linear)",
        "backend": "cpu plumbing rig (4 virtual devices/host)",
        "rig_gap_decomposition": {
            "indep_2proc_efficiency": round(eff_indep, 4),
            "note": "indep = same work, no process group: the "
                    "indep-vs-1.0 gap is pure CPU oversubscription of "
                    "the shared box; the dist-vs-indep gap is what the "
                    "distributed runtime (group barriers, cross-process "
                    "dispatch) actually costs",
        },
        "caveat": "both rig 'hosts' share ONE physical CPU, so the rig "
                  "ceiling is set by core oversubscription, not 1.0 — "
                  "the number validates the code path; real pods "
                  "measure with --real",
        "one_host": r1, "two_host": r2, "indep_two_proc": ri,
        "target": ">= 0.85 on real >= 2-host TPU pods (BASELINE.md)",
    }))


def real():
    from tracer.dist import multihost as mh
    mh.initialize()
    import jax
    mesh = mh.make_pod_mesh()
    res = measure(mesh, f"real-{jax.process_count()}host")
    if jax.process_index() == 0:
        print(json.dumps(res))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
               sys.argv[5],
               sys.argv[6] if len(sys.argv) > 6 else "dist")
    elif len(sys.argv) > 1 and sys.argv[1] == "--real":
        real()
    else:
        driver()
