"""Training CLI.

Usage parity with /root/reference/train.py:12-60 (installed as the
``seqrec-train`` console script; the repo-root train.py wrapper keeps the
reference invocation style):
``python train.py -d DATASET_DIR -m RNN --loss CCE --save Best ...``
"""

from __future__ import annotations

import numpy as np

import seqrec_tpu.utils.command_parser as parse
from seqrec_tpu.data import DataHandler


def training_command_parser(parser):
    parser.add_argument(
        "--tshuffle", help="Shuffle sequences during training.", action="store_true"
    )
    parser.add_argument(
        "--extended_set",
        help="Use extended training set (first half of validation and test users).",
        action="store_true",
    )
    parser.add_argument(
        "-d", dest="dataset", help="Directory name of the dataset.", default="", type=str
    )
    parser.add_argument(
        "--dir", help="Directory name to save model.", default="", type=str
    )
    parser.add_argument(
        "--save",
        choices=["All", "Best", "None"],
        help="Policy for saving models.",
        default="Best",
    )
    parser.add_argument(
        "--metrics",
        help="Metrics for validation, comma separated",
        default="sps",
        type=str,
    )
    parser.add_argument(
        "--time_based_progress",
        help="Progress based on time instead of iterations.",
        action="store_true",
    )
    parser.add_argument(
        "--load_last_model",
        help="Load last model before starting training.",
        action="store_true",
    )
    parser.add_argument("--progress", help="Progress intervals", default="2.", type=str)
    parser.add_argument(
        "--mpi", help="Max progress intervals", default=np.inf, type=float
    )
    parser.add_argument(
        "--max_iter", help="Max number of iterations", default=np.inf, type=float
    )
    parser.add_argument(
        "--max_time", help="Max training time in seconds", default=np.inf, type=float
    )
    parser.add_argument(
        "--min_iter",
        help="Min iterations before showing progress",
        default=0.0,
        type=float,
    )
    parser.add_argument(
        "--profile",
        help="Capture a JAX profiler trace of the training run into this directory.",
        default="",
        type=str,
    )
    parser.add_argument(
        "--spd",
        dest="steps_per_dispatch",
        help="Optimizer steps fused into one device dispatch (amortizes remote-dispatch overhead).",
        default=1,
        type=int,
    )
    parser.add_argument(
        "--mesh",
        help='Shard training over a ("data","model") device mesh: "DATA,MODEL" '
        '(e.g. "4,2"), or "auto" to span all visible devices. Catalog tables '
        '(input embedding rows, softmax columns) shard over "model", the batch '
        'over "data". Multi-host pods: launch the same command on every host '
        "with JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID set "
        "(or TPU auto-detection).",
        default="",
        type=str,
    )


def num(s):
    try:
        return int(s)
    except ValueError:
        return float(s)


def make_cli_mesh(spec: str):
    """Build the ("data","model") mesh for a --mesh spec.

    Must run before any other JAX operation: multi-host runs have to
    initialize jax.distributed while the backend is still cold."""
    from seqrec_tpu.parallel import make_mesh
    from seqrec_tpu.parallel.distributed import init_distributed, make_pod_mesh

    distributed = init_distributed()
    if spec == "auto":
        return make_pod_mesh() if distributed else make_mesh()
    try:
        n_data, n_model = (int(x) for x in spec.split(","))
    except ValueError:
        raise ValueError(
            f'--mesh must be "auto" or "DATA,MODEL" (e.g. "4,2"), got {spec!r}'
        ) from None
    if distributed:
        mesh = make_pod_mesh(n_model=n_model)
        if mesh.shape["data"] != n_data:
            raise ValueError(
                f"--mesh {spec} asks for {n_data}x{n_model} devices but the "
                f"pod exposes {mesh.shape['data']}x{n_model}"
            )
        return mesh
    return make_mesh(n_data=n_data, n_model=n_model)


def main(argv=None):
    args = parse.command_parser(
        parse.predictor_command_parser,
        training_command_parser,
        parse.early_stopping_command_parser,
        argv=argv,
    )
    mesh = make_cli_mesh(args.mesh) if args.mesh else None
    predictor = parse.get_predictor(args)
    dataset = DataHandler(
        dirname=args.dataset,
        extended_training_set=args.extended_set,
        shuffle_training=args.tshuffle,
    )
    predictor.prepare_model(dataset)
    if mesh is not None:
        if not hasattr(predictor, "set_mesh"):
            raise ValueError(
                f"--mesh is supported for the RNN/SDAE/cluster families "
                f"(sharded training) and the MF family (sharded eval "
                f"top-k); {predictor.name!r} runs single-device"
            )
        predictor.set_mesh(mesh)
    if args.steps_per_dispatch > 1 and hasattr(predictor, "steps_per_dispatch"):
        predictor.steps_per_dispatch = args.steps_per_dispatch

    profile_ctx = None
    if args.profile:
        import jax

        profile_ctx = jax.profiler.trace(args.profile)
        profile_ctx.__enter__()

    result = predictor.train(
        dataset,
        save_dir=dataset.dirname + "models/" + args.dir,
        time_based_progress=args.time_based_progress,
        progress=num(args.progress),
        autosave=args.save,
        max_progress_interval=args.mpi,
        max_iter=args.max_iter,
        min_iterations=args.min_iter,
        max_time=args.max_time,
        early_stopping=parse.get_early_stopper(args),
        load_last_model=args.load_last_model,
        validation_metrics=args.metrics.split(","),
    )
    if profile_ctx is not None:
        profile_ctx.__exit__(None, None, None)
        print("Profiler trace written to", args.profile)
    return result


if __name__ == "__main__":
    main()
