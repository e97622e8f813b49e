"""homan_tpu — TPU-native joint hand-object reconstruction from RGB video.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the reference
optimization pipeline (hassony2/homan): given per-frame 2D evidence (hand/object
masks, hand keypoints, MANO initializations), it fits MANO hand pose and object
6DoF pose jointly over a clip with silhouette, keypoint, temporal-smoothness and
physical interaction losses.

Architecture (TPU-first, not a port):
  * all optimizable state lives in parameter pytrees (no stateful modules);
  * the optimizer loops are `lax.scan`s compiled once per shape bucket;
  * frames and pose candidates are `vmap` batch axes;
  * clips shard data-parallel over a `jax.sharding.Mesh`;
  * the differentiable silhouette/depth renderer is a tiled rasterizer whose
    inner products run on the MXU (see homan_tpu.render);
  * mesh->SDF voxelization is a dense point-grid formulation (homan_tpu.interactions).

Layer map:
  core/          geometry, cameras, bboxes, MANO hand model, mesh utils
  render/        differentiable tiled rasterizer (silhouette / depth / RGB)
  interactions/  SDF collision + contact losses
  fit/           loss library, stage-B pose initializer, stage-C joint fit
  frontend/      host-side evidence preparation (masks, crops, occlusion targets)
  tracking/      Kalman/RTS box smoothing, sequence tracking
  data/          dataset shells, chunking, collation, mesh loading
  eval/          point metrics, chunk interpolation, reporting
  parallel/      device-mesh sharding of independent clips
  cli/           fit_vid_dataset / track_dataset / evalho3d drivers
"""

__version__ = "0.1.0"


def _host_fingerprint() -> str:
    """Short stable id of (hostname, CPU feature set) for cache scoping."""
    import hashlib
    import platform
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except OSError:
        flags = platform.machine()
    return hashlib.sha1(
        (platform.node() + "|" + flags).encode()).hexdigest()[:12]


def enable_jit_cache(path: str | None = None):
    """Point JAX at a persistent compilation cache.

    First compiles of the big fit programs cost 1-2 minutes on remote TPU
    runtimes; the cache removes them across processes (measured 16 s -> 2 s
    on a representative program). Called automatically on import; opt out
    with HOMAN_TPU_JIT_CACHE=0, redirect by setting it to a path.
    """
    import os
    env = os.environ.get("HOMAN_TPU_JIT_CACHE")
    if env == "0":
        return None
    # CPU runs (tests, the multichip dryrun child) gain nothing from the
    # cache — their compiles are fast. Skip it when CPU is requested through
    # either env spelling (jax.config-level overrides made after this import
    # are covered by the host-scoped path below).
    if env is None and any(
            os.environ.get(var, "").strip().lower().split(",")[0] == "cpu"
            for var in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME")):
        return None
    if path is None:
        # XLA:CPU cache entries are AOT machine code keyed WITHOUT the
        # host's CPU features: an entry written on one x86 host can be
        # loaded on another and SIGILL (observed: a driver machine wrote
        # avx512/amx code the local host lacks, through a shared $HOME).
        # Scoping the directory by a host fingerprint makes foreign loads
        # impossible for every backend-selection path — env vars, late
        # jax.config.update("jax_platforms", ...), or default fallback —
        # while keeping the same-machine cross-process wins.
        path = env or os.path.join(
            os.path.expanduser("~"), ".cache", "homan_tpu", "jax",
            _host_fingerprint())
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # older jax without the knobs
        return None
    return path


_JIT_CACHE_DIR = enable_jit_cache()
