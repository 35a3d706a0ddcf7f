"""Configuration for the TPU-native ALS framework.

One dataclass carries everything the reference spreads over three tiers:
runtime argv (reference main.cpp:32-44), compile-time ``#define`` feature
flags (reference als.cu:25-45, main.cpp:16-17) and the hugewiki
compile-time constants (reference hugewiki/hugewiki.cu:27-42).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ALSConfig:
    """Full configuration of one ALS run.

    Runtime-argv tier (reference main.cpp:32-44):
      m, n, f, nnz, nnz_test, lam, x_batch, theta_batch, data_dir.
    Compile-time tier (reference als.cu:25-45, main.cpp:16-17):
      iters (ITERS=10), solver (USE_CG), cg_iters (CG_ITER=6),
      cg_tol (CG_ERROR=1e-4, cg.cu:31), factor_dtype (CUMF_USE_HALF),
      gram_dtype (CUMF_TT_FP16/CUMF_XX_FP16), surpass_nan (SURPASS_NAN),
      save_model (CUMF_SAVE_MODEL).
    """

    # --- problem shape (argv tier) ---
    m: int
    n: int
    f: int
    nnz: int = 0
    nnz_test: int = 0
    lam: float = 0.048
    x_batch: int = 1
    theta_batch: int = 1
    data_dir: str = ""

    # --- training loop (ITERS, main.cpp:17) ---
    iters: int = 10
    seed: int = 0
    init_scale: float = 0.2  # thetaT = init_scale * U(0,1), main.cpp:75

    # --- solver (USE_CG / CG_ITER / CG_ERROR; als.cu:28-32, cg.cu:31) ---
    solver: str = "cg"  # one of: "cg", "cholesky", "lu"
    cg_iters: int = 6
    cg_tol: float = 1e-4

    # --- precision (CUMF_USE_HALF / CUMF_TT_FP16; als.cu:26-31) ---
    # factor_dtype: storage dtype of the gathered factor used to form the
    # Gram matrices ("f32" or "bf16" — the bf16 analog of fp16 theta).
    factor_dtype: str = "f32"
    # factor_store: RESIDENT dtype of the factor matrices between
    # phases. "bf16" halves factor HBM (the lever for device-resident
    # hugewiki at m>=10M rows); solved rows round at write-back and CG
    # warm-starts read the rounded values — second-order, since every
    # row re-solves each iteration. Default f32 (bit-identical to r4).
    factor_store: str = "f32"
    # gram_precision: MXU precision of the Gram einsum on f32 inputs:
    # "highest" (~fp32, 6-pass), "high" (bf16x3), "default" (1-pass bf16).
    gram_precision: str = "highest"
    # gram_dtype: storage dtype of the assembled Gram matrices fed to the
    # solver ("f32" or "bf16" — the CUMF_TT_FP16 analog).
    gram_dtype: str = "f32"

    # --- RMSE (SURPASS_NAN, als.cu:27) ---
    # Rows/cols with zero training ratings get zero factors, which gives
    # prediction 0 for their test entries — the *intended* semantics of the
    # reference's SURPASS_NAN NaN-skip (als.cu:201-211).
    surpass_nan: bool = True
    # "fused": train RMSE from the theta-phase Gram/RHS identity — exact
    # (ops/rmse.py) and free, the default everywhere (CLI, bench and the
    # Python API agree since r3); "direct": per-nonzero gather + dot
    # (reference RMSE kernel semantics), kept as the A/B flag.
    train_rmse_method: str = "fused"

    # --- bucketing / memory batching ---
    # Padded row-bucket widths are powers of two in [min_bucket_width,
    # max_bucket_width]; rows longer than max_bucket_width still get a
    # single bucket of the next power of two (a Gram row must see all its
    # nonzeros at once).
    min_bucket_width: int = 8
    max_bucket_width: int = 1 << 18
    # Upper bound on padded nonzeros processed by one jitted chunk. This is
    # the TPU analog of X_BATCH/THETA_BATCH (als.cu:768, 881): it bounds the
    # transient gather buffer (chunk_nnz * f * dtype bytes).
    chunk_nnz: int = 1 << 22
    # Upper bound on rows per chunk: bounds the Gram buffer
    # (chunk_rows * f_pad^2 * 4 bytes), the dominant allocation — the
    # analog of the reference's per-batch tt buffer (als.cu:780-783).
    chunk_rows: int = 1 << 14
    # Rows per batch of the two-level batched-panel path (both-sides-big
    # phases): bigger batches mean fuller width buckets (lower padding,
    # fewer compiled shapes) at the cost of a larger reusable (B, f, f)
    # accumulator. 0 = auto: 2^17 rows with bf16 Gram accumulators
    # (4.3 GB), 2^16 with f32 (4.3 GB as well).
    batch_rows: int = 0
    # Width-grid density: 4 = quarter-octave (pad <= 1.25x/row),
    # 8 = eighth-octave from width 64 up (pad <= 1.125x where the mass
    # is, ~2x the compiled shapes). Padding is wall-clock on TPU.
    octave_points: int = 8
    # Panel-path subrows longer than this split into exact segments
    # (partial Grams sum over any partition of a row); kills the
    # wide-bucket dummy tail. 0 disables.
    split_width: int = 4096

    # --- kernels ---
    # "xla": bucketed gather + einsum path; "pallas": fused Pallas kernels
    # where available (falls back to xla per-op otherwise).
    backend: str = "xla"
    # Panelized Gram: when the gather table exceeds panel_size rows, XLA
    # can no longer stage it on-chip and random row-gathers drop to
    # HBM rate (~2x slower, measured on v5e). If the updated factor's
    # full (A, b) accumulators fit in panel_budget_bytes, the phase is
    # restructured as per-panel partial Grams scatter-added into the
    # accumulators ("auto"). "never" forces the direct path.
    use_panels: str = "auto"       # auto | never
    # Augmented-lane Gram: when the true F leaves lane f_pad-1 free
    # (any F not a multiple of 128 — including the reference's F=100
    # headline), the rating values ride that lane of the gathered G and
    # one MXU accumulation forms A, b and sum(r^2) together
    # (ops/pallas_solve._kernel_aug). Measured economics differ by
    # path (VERDICT r3 #3): on ACCUMULATE-then-solve paths one psum/
    # scatter-add replaces three, so "auto" engages there (f32
    # accumulators only — ADVICE r3); on the DIRECT fused path the
    # saved RHS pass is cheaper than the in-kernel lane splice
    # (Netflix 0.9958 split vs 1.006 aug s/iter), so "auto" resolves
    # to off. "force" turns aug on everywhere, including the direct
    # path and the bf16-accumulator case — an A/B lever, NOT a
    # production setting. "off" disables aug on every path.
    aug_gram: str = "auto"         # auto | off | force
    panel_size: int = 1 << 16
    panel_budget_bytes: int = 2 << 30
    # Split-table direct gathers for both-sides-big phases (the
    # Yahoo-class fix): the gather table is popularity-permuted and cut
    # into parts of at most gather_part_bytes, each row's column list is
    # split per part, and the per-part gathers concatenate into ONE
    # fused Gram+CG instance — every gather runs at the fast small-
    # operand tier (~4.3 vs ~13.2 ns/row measured on v5e,
    # scripts/bench_gather.py) and no accumulator RMW exists. "auto"
    # engages where the direct/batched-panel fallback would otherwise
    # pay HBM-tier gathers; "force" overrides the panel path too (A/B);
    # "off" restores the r3 behavior.
    split_gather: str = "auto"     # auto | off | force
    gather_part_bytes: int = 64 << 20
    # Auto-mode engagement threshold: split only pays off once the
    # gather table is in the genuinely slow HBM tier. Measured on v5e
    # (netflix/yahoo A/B, round4_logs): a 123 MB bf16 table ran FASTER
    # direct (0.996 vs 1.03 s/iter — split's ~3% expansion + per-part
    # slice overhead exceeded its gather gain), while 160 MB and 256 MB
    # tables ran ~44% faster split (yahoo 8.04 -> 4.49 s/iter).
    split_min_table_bytes: int = 128 << 20
    # SplitPlan group budget: rows sharing a quantized per-part width
    # tuple form a group (one compiled program family each); the greedy
    # merger folds the tail of tiny groups into their lex neighbors
    # until at most this many remain (r5 — yahoo X-phase expansion
    # 1.28 -> 1.18 at ~137 shapes; 160 groups reach 1.14 at ~190).
    split_max_groups: int = 96
    # Two-block wide-F kernel (128 < F <= 256): measured SLOWER than
    # the monolithic 256-lane kernel on v5e (three 128-wide MXU output
    # tiles pipeline at ~11 TF/s vs ~21 for one 256-wide tile) — kept
    # for A/B only; see ops/pallas_solve.wide_enabled.
    wide_kernel: str = "off"       # off | on
    # Fuse a whole direct phase into one jitted program: chunk updates
    # are row-disjoint, so their solves are independent and XLA can
    # overlap gathers with kernels across chunks; write-back is one
    # combined scatter. Costs compile time and peak-memory headroom;
    # applied only when the phase has <= fuse_max_chunks chunks.
    fuse_phase: bool = True
    fuse_max_chunks: int = 256

    # --- plan cache ---
    # Directory for the on-disk plan cache (utils/plan_cache.py): built
    # update plans and the CSC transpose are persisted keyed by dataset
    # fingerprint + shape knobs, making startup an mmap load instead of
    # a rebuild (the reference's startup is an fread,
    # host_utilities.cpp:19-97). None disables caching.
    plan_cache_dir: Optional[str] = None

    # --- checkpoint / resume (reference has none; SURVEY §5) ---
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0  # iterations; 0 = disabled
    resume: bool = False

    # --- observability ---
    verbose: bool = True       # reference-style stdout contract lines
    debug_timing: bool = True  # per-phase timing lines (make debug analog)
    save_model: bool = False   # CUMF_SAVE_MODEL analog: dump Gram/solve artifacts
    save_model_dir: str = "./log"
    profile_dir: Optional[str] = None  # jax.profiler trace output
    metrics_jsonl: Optional[str] = None  # append per-iteration JSON lines

    # --- parallelism (hugewiki tier; SURVEY §2 items 14-17) ---
    mesh_shape: Optional[Tuple[int, ...]] = None  # e.g. (8,) data axis
    # ShardedALS.run() step dispatch: "auto" runs the whole iteration
    # (X phase + psum'd theta phase) as ONE jitted SPMD program on
    # accelerator meshes — per-chunk dispatch overhead and the failed
    # cross-dispatch accumulator donation disappear (VERDICT r3 #4) —
    # and falls back to per-chunk jits on CPU meshes, where one big
    # program at realistic shapes holds every chunk's gather buffers
    # live at once (observed XLA:CPU abort, r3). "on"/"off" force.
    fused_step: str = "auto"
    mesh_axis_names: Tuple[str, ...] = ("data",)
    # out-of-core: keep the large factor host-resident, stream shards
    host_offload_x: bool = False
    # Sharded+OOC X placement: "host" streams X through device memory
    # (the reference's pinned XT_h, hugewiki.cu:2300-2302, with warm-
    # started CG); "device" keeps each device's X shard HBM-resident in
    # the store dtype and COLD-starts the per-row CG solves — X never
    # crosses the host boundary (the D2H path has no fast lane on
    # tunneled chips; docs/PERFORMANCE.md r3). At reference-hugewiki
    # scale the bf16 X shard (12.8 GB) fits one v5e chip, which the
    # reference's 12 GB GPUs could not do — raise cg_iters (the
    # reference's own hugewiki uses cgIter=100, hugewiki.cu:2569) to
    # cover the missing warm start.
    x_placement: str = "host"
    # device-X only: warm-start each chunk's CG from the HBM-resident
    # shard (r4 — free, no x0 upload; restores the plain-ALS monotone
    # train RMSE that r3's cold starts lost, VERDICT r3 #5). Turn OFF
    # for per-process state-dir runs: X is deliberately NOT persisted
    # across processes there (theta alone is the checkpoint), so a
    # restarted iteration cannot warm-start and the resume-identity
    # contract only holds under matching (cold) semantics — the
    # reference's own hugewiki mode, cgIter=100 cold (hugewiki.cu:2569).
    x_warm_start: bool = True
    # Streamed-plan transport dtype for rating values on the
    # host->device path (sharded/out-of-core streaming only; device-
    # resident plans keep f32). "f16" halves the dominant H2D volume;
    # integer-grid ratings (Netflix/ML-10M 1..5) are exact in fp16, and
    # the Gram/RHS accumulate in f32 either way. Column ids compact to
    # uint16 automatically whenever the gather-table size fits.
    stream_val_dtype: str = "f32"

    def __post_init__(self):
        if self.f <= 0:
            raise ValueError(f"F must be positive, got {self.f}")
        if self.solver not in ("cg", "cholesky", "lu"):
            raise ValueError(f"unknown solver {self.solver!r}")
        if self.factor_dtype not in ("f32", "bf16"):
            raise ValueError(f"unknown factor_dtype {self.factor_dtype!r}")
        if self.gram_dtype not in ("f32", "bf16"):
            raise ValueError(f"unknown gram_dtype {self.gram_dtype!r}")
        if self.gram_precision not in ("highest", "high", "default"):
            raise ValueError(f"unknown gram_precision {self.gram_precision!r}")
        if self.train_rmse_method not in ("direct", "fused"):
            raise ValueError(
                f"unknown train_rmse_method {self.train_rmse_method!r}")
        if self.backend not in ("xla", "pallas"):
            raise ValueError(f"unknown backend {self.backend!r}")
        if self.use_panels not in ("auto", "never"):
            raise ValueError(f"unknown use_panels {self.use_panels!r}")
        if self.aug_gram not in ("auto", "off", "force"):
            raise ValueError(f"unknown aug_gram {self.aug_gram!r}")
        if self.stream_val_dtype not in ("f32", "f16"):
            raise ValueError(
                f"unknown stream_val_dtype {self.stream_val_dtype!r}")
        if self.x_placement not in ("host", "device"):
            raise ValueError(f"unknown x_placement {self.x_placement!r}")
        if self.fused_step not in ("auto", "on", "off"):
            raise ValueError(f"unknown fused_step {self.fused_step!r}")
        if self.split_gather not in ("auto", "off", "force"):
            raise ValueError(
                f"unknown split_gather {self.split_gather!r}")
        if self.wide_kernel not in ("off", "on"):
            raise ValueError(f"unknown wide_kernel {self.wide_kernel!r}")

    def split_part_rows(self) -> int:
        """Rows per gather-table part: the largest multiple of 8 whose
        f_pad-lane slab stays under gather_part_bytes in the gather
        (factor) dtype."""
        item = 2 if self.factor_dtype == "bf16" else 4
        s = self.gather_part_bytes // (self.f_pad * item)
        return max(8, (s // 8) * 8)

    @property
    def f_pad(self) -> int:
        """F padded to the TPU lane width (128) or a multiple of it.

        The reference restricts F to multiples of T10=10 (main.cpp:33-35)
        because its register tiles are 10x10 (als.h:39). The MXU tile is
        128x128, so every F pads to a multiple of 128; F=100 runs on the
        same footing as F=128.
        """
        return max(128, ((self.f + 127) // 128) * 128)

    def replace(self, **kw) -> "ALSConfig":
        return dataclasses.replace(self, **kw)


# Canonical workload definitions from the reference (README.md:71-90,
# hugewiki/hugewiki.cu:27-42). Used by tests/benchmarks with synthetic data.
NETFLIX = ALSConfig(m=17770, n=480189, f=100, nnz=99_072_112,
                    nnz_test=1_408_395, lam=0.048, x_batch=1, theta_batch=3)
ML10M = ALSConfig(m=71567, n=65133, f=100, nnz=9_000_048,
                  nnz_test=1_000_006, lam=0.05, x_batch=1, theta_batch=1)
YAHOO = ALSConfig(m=1_000_990, n=624_961, f=100, nnz=252_800_275,
                  nnz_test=4_003_960, lam=1.4, x_batch=6, theta_batch=3)
HUGEWIKI = ALSConfig(m=50_082_603, n=39_780, f=100, nnz=3_101_144_313,
                     nnz_test=344_573_330, lam=0.048, x_batch=240,
                     theta_batch=3, host_offload_x=True)
