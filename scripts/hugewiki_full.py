"""Full-hugewiki capability run: the reference's flagship workload
(M=50,082,603, N=39,780, NNZ=3,101,144,313 — "the largest matrix
factorization problem ever reported", reference hugewiki/hugewiki.cu:27-42,
README.md:15) on ONE TPU chip + host memory, via the combined
sharded+out-of-core program (parallel/sharded_ooc.py):

  - X (50M x 128 = 25.6 GB) host-resident, streamed per chunk/panel
    (the XT_h analog, hugewiki.cu:2300-2302);
  - plan arrays lazy — padded chunks materialize at stream time
    (hugewiki.cu:2508-2516's per-batch CSR re-slice);
  - all flat indexing int64 (nnz > 2^31, hugewiki.cu:2299's concern);
  - theta partial Grams accumulated on-device, psum'd (1-device: free).

Usage: python scripts/hugewiki_full.py [--scale 1.0] [--iters 1]
Prints one JSON line with per-iteration timings and RMSEs.
"""

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--iters", type=int, default=1)
    p.add_argument("--devices", type=int, default=1)
    p.add_argument("--f", type=int, default=100)
    p.add_argument("--cg-iters", type=int, default=20,
                   help="CG budget (reference hugewiki uses cgIter=100 "
                        "with cold starts, hugewiki.cu:2569; here every "
                        "X placement warm-starts — device-X from the "
                        "HBM-resident shard, r4 — and the in-kernel "
                        "early exit makes unused budget nearly free)")
    p.add_argument("--x-placement", default="device",
                   choices=["device", "host"],
                   help="device: X shards HBM-resident (12.8 GB bf16 at "
                        "full scale fits one v5e), ratings stream via "
                        "the chunked fast path, nothing crosses D2H; "
                        "host: the reference-style streamed XT_h store")
    p.add_argument("--state-dir", default=None,
                   help="run ONE iteration per process, persisting "
                        "(x_host, theta, iter) here; re-invoke until "
                        "--iters are done. Bounds the axon tunnel "
                        "client's H2D leak (~1 byte leaked per byte "
                        "streamed) to a single iteration's volume.")
    p.add_argument("--x-warm-start", default="auto",
                   choices=["auto", "on", "off"],
                   help="device-X CG warm start from the HBM shard. "
                        "auto: on, except off under --state-dir — the "
                        "per-process mode persists theta alone, so a "
                        "restarted iteration has no previous X to warm "
                        "from and the state-dir trajectory only equals "
                        "the single-process one under cold starts")
    args = p.parse_args(argv)

    from cumf_als_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    print(f"[hugewiki] devices: {jax.devices()}", file=sys.stderr,
          flush=True)

    # Recompile classification (VERDICT r4 #5): every XLA compile is
    # logged with a timestamp; compiles after the in-loop marker are
    # counted and reported so an iteration-time spike can be attributed
    # to a recompile vs a tunnel/transfer stall instead of guessed at.
    compile_log: list = []
    try:
        import logging

        class _CompileCounter(logging.Handler):
            def emit(self, record):
                msg = record.getMessage()
                # count genuine backend compilations only — tracing and
                # lowering happen every process even on full cache hits
                if "Finished XLA compilation" in msg:
                    compile_log.append((time.monotonic(), msg[:120]))

        jax.config.update("jax_log_compiles", True)
        logging.getLogger("jax._src.dispatch").addHandler(
            _CompileCounter())
        logging.getLogger("jax._src.interpreters.pxla").addHandler(
            _CompileCounter())
    except Exception:
        pass

    import bench
    t0 = time.monotonic()
    train, test = bench.load_workload("hugewiki", args.scale)
    print(f"[hugewiki] dataset ready in {time.monotonic() - t0:.0f}s: "
          f"m={train.num_rows} n={train.num_cols} nnz={train.nnz} "
          f"nnz_test={test.nnz} rss={rss_gb():.1f}GB",
          file=sys.stderr, flush=True)

    from cumf_als_tpu.config import ALSConfig
    from cumf_als_tpu.data.synthetic import init_factors
    from cumf_als_tpu.parallel.sharded_ooc import ShardedOutOfCoreALS

    # state-dir mode runs exactly one iteration per process (leak
    # bound); peek at the resume index before freezing the config
    next_iter = 0
    if args.state_dir:
        st_path = os.path.join(args.state_dir, "state.json")
        if os.path.exists(st_path):
            with open(st_path) as fh:
                next_iter = json.load(fh)["next_iter"]
        if next_iter >= args.iters:
            with open(st_path) as fh:
                print(fh.read(), flush=True)
            return 0

    device_x = args.x_placement == "device"
    warm = (args.x_warm_start == "on" or
            (args.x_warm_start == "auto" and not args.state_dir))
    cfg = ALSConfig(m=train.num_rows, n=train.num_cols, f=args.f,
                    nnz=train.nnz, nnz_test=test.nnz, lam=0.048,
                    iters=(next_iter + 1 if args.state_dir
                           else args.iters),
                    solver="cg", x_warm_start=warm,
                    cg_iters=args.cg_iters, factor_dtype="bf16",
                    gram_dtype="bf16", backend="pallas",
                    host_offload_x=True, verbose=True,
                    x_placement=args.x_placement,
                    # device-X: the fused kernel keeps Gram in VMEM, so
                    # chunks can be much larger — fewer, fatter
                    # dispatches on the tunnel. 2^22 slots bounds the
                    # transient gathered slab at ~1 GB so a couple of
                    # in-flight chunks coexist with the 12 GiB X shard.
                    chunk_nnz=(1 << 22 if device_x else 1 << 22),
                    chunk_rows=(1 << 17 if device_x else 1 << 14),
                    plan_cache_dir=os.path.join(bench.CACHE_DIR, "plans"),
                    stream_val_dtype="f16", debug_timing=True)
    t0 = time.monotonic()
    model = ShardedOutOfCoreALS(cfg, train, None, test,
                                n_devices=args.devices)
    plan_s = time.monotonic() - t0
    print(f"[hugewiki] plans built in {plan_s:.0f}s "
          f"({model.n_panels} local X panels x {model.n_dev} devices, "
          f"{len(model.row_plan.chunks)} X chunks, "
          f"{len(model.theta_steps)} theta steps) rss={rss_gb():.1f}GB",
          file=sys.stderr, flush=True)

    if args.state_dir:
        os.makedirs(args.state_dir, exist_ok=True)
        st_path = os.path.join(args.state_dir, "state.json")
        if os.path.exists(st_path):
            with open(st_path) as fh:
                st = json.load(fh)
            it = st["next_iter"]
            x_host0 = None
            if not device_x:
                x_host0 = np.load(os.path.join(
                    args.state_dir, "x_host.npy")).view(
                    model._x_store_dtype())
            th0 = np.load(os.path.join(args.state_dir, "theta.npy"))
        else:
            st = {"next_iter": 0, "history": []}
            it = 0
            x_host0 = None
            _, th0 = init_factors(8, cfg.n, cfg.f, seed=cfg.seed)
        t0 = time.monotonic()
        res = model.run(
            None if (x_host0 is not None or device_x) else np.zeros(
                (cfg.m, cfg.f), np.float32),
            th0, start_iter=it, x_host0=x_host0, keep_sharded=True)
        iter_s = time.monotonic() - t0
        # atomic: a crash mid-save must not corrupt the only checkpoint.
        # device-X: cross-iteration state is theta ALONE (X is re-solved
        # from theta each iteration; D2H of the 12.8 GB shard would cost
        # ~6 min/iteration on the tunnel for nothing).
        saves = [("theta", res.theta)]
        if not device_x:
            saves.append(("x_host", model.x_host))
        for name, arr in saves:
            tmp = os.path.join(args.state_dir, name + ".tmp.npy")
            np.save(tmp, arr)
            os.replace(tmp, os.path.join(args.state_dir, name + ".npy"))
        h = res.history[-1]
        st["history"].append(
            {"iter": it, "x_seconds": round(h.x_seconds, 1),
             "theta_seconds": round(h.theta_seconds, 1),
             "train_rmse": round(h.train_rmse, 5),
             "test_rmse": round(h.test_rmse, 5),
             "iter_seconds": round(iter_s, 1),
             "plan_seconds": round(plan_s, 1),
             # with a warmed persistent cache this must be 0; a nonzero
             # count explains (and indicts) an iteration-time spike
             "n_compiles": len(compile_log),
             "rss_gb": round(rss_gb(), 1)})
        st["next_iter"] = it + 1
        with open(st_path + ".tmp", "w") as fh:
            json.dump(st, fh)
        os.replace(st_path + ".tmp", st_path)
        print(json.dumps(st["history"][-1]), flush=True)
        return 0

    x0 = (None if device_x else
          np.zeros((cfg.m, cfg.f), np.float32))  # reference init: X = 0
    _, th0 = init_factors(8, cfg.n, cfg.f, seed=cfg.seed)
    t0 = time.monotonic()
    res = model.run(x0, th0)
    total = time.monotonic() - t0
    # classify in-loop recompiles: compiles stamped after iteration 0's
    # combined phase time has elapsed ran inside the timed steady loop
    iter0_end = t0 + (res.history[0].x_seconds +
                      res.history[0].theta_seconds if res.history else 0)
    in_loop = [m for (ts, m) in compile_log if ts > iter0_end]

    out = {
        "metric": "hugewiki_f%d_sec_per_iter" % args.f,
        "value": round(total / max(1, args.iters), 2),
        "unit": "s/iter",
        "scale": args.scale,
        "m": cfg.m, "n": cfg.n, "nnz": train.nnz,
        "iters": args.iters,
        "plan_seconds": round(plan_s, 1),
        "x_seconds": [round(h.x_seconds, 1) for h in res.history],
        "theta_seconds": [round(h.theta_seconds, 1)
                          for h in res.history],
        "train_rmse": [round(h.train_rmse, 5) for h in res.history],
        "test_rmse": [round(h.test_rmse, 5) for h in res.history],
        "rss_gb": round(rss_gb(), 1),
        "n_compiles": len(compile_log),
        "n_compiles_in_loop": len(in_loop),
        "in_loop_compiles": in_loop[:8],
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
