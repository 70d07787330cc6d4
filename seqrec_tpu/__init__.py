"""seqrec_tpu: a TPU-native sequential-recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``rdevooght/sequence-based-recommendations`` (mounted read-only at
/root/reference): top-N item recommendation from user interaction
sequences, with an RNN family (full-softmax CCE, sampled losses,
margin losses, clustered softmax), a factorization family (BPR-MF,
FPMC, FISM, Fossil), lazy baselines (POP, Markov, user-KNN), an SDAE
and a word2vec-trajectory model — all implemented TPU-first:

- models are pure functions over parameter pytrees, train steps are
  jitted ``lax.scan``/``fori_loop`` programs with static shapes;
- the data pipeline produces packed integer arrays so batch assembly
  is gathers, not per-item Python featurization;
- the item-embedding input table and softmax output table shard over
  a ``jax.sharding.Mesh`` "model" axis while dense towers run
  data-parallel over the "data" axis;
- hot ops (multi-hot embedding gather-sum, fused recurrent cells,
  sampled-softmax losses, masked top-k) have Pallas TPU kernels with
  pure-XLA fallbacks for CPU tests.
"""

__version__ = "0.1.0"


def _machine_tag() -> str:
    """Fingerprint of the host CPU's feature set, used to segregate the
    compile cache per machine: XLA:CPU caches AOT-compiled executables
    whose codegen targets the COMPILE machine's features, and loading
    them on a host with a different feature set intermittently SIGILLs /
    aborts mid-execution (the cpu_aot_loader warns exactly this). A
    container image migrating between heterogeneous hosts must therefore
    never share cache entries across CPU types."""
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{platform.machine()} {flags}"
    return hashlib.sha1(raw.encode()).hexdigest()[:12]


def _enable_persistent_compile_cache() -> None:
    """Point JAX's persistent compilation cache at a local directory so
    repeat CLI invocations (train.py / test.py sweeps) skip the 20-100s
    first-compile of the fused train/eval programs. Opt out with
    SEQREC_NO_COMPILE_CACHE=1 or override via JAX_COMPILATION_CACHE_DIR."""
    import os

    if os.environ.get("SEQREC_NO_COMPILE_CACHE"):
        return
    # XLA:CPU reloading AOT-cached executables intermittently aborts on
    # scatter-heavy sharded programs (observed even for same-machine
    # cache entries; the loader's machine-feature diagnostics point at
    # codegen/host drift). The cache only meaningfully helps the
    # TPU-side CLI sweeps, so leave it off whenever CPU is the selected
    # platform (tests, the driver's virtual-mesh dryrun).
    if os.environ.get("JAX_PLATFORMS", "").split(",")[0].strip().lower() == "cpu":
        return
    try:
        import jax

        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "seqrec_tpu", "xla", _machine_tag()
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that takes noticeable time, not just >1s programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax or read-only home: run without the cache


_enable_persistent_compile_cache()
