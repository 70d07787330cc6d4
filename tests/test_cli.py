"""CLI surface: factory dispatch parity and in-process train/test drives."""

import sys

import numpy as np
import pytest

import seqrec_tpu.utils.command_parser as parse


def _args(extra):
    return parse.command_parser(
        parse.predictor_command_parser, argv=extra
    )


@pytest.mark.parametrize(
    "argv,cls_name",
    [
        (["-m", "RNN"], "RNNOneHot"),
        (["-m", "RNN", "--loss", "BPR"], "RNNSampling"),
        (["-m", "RNN", "--loss", "TOP1"], "RNNSampling"),
        (["-m", "RNN", "--loss", "hinge"], "RNNMargin"),
        (["-m", "RNN", "--loss", "logsig"], "RNNMargin"),
        (["-m", "RNN", "--clusters", "4"], "RNNCluster"),
        (["-m", "FISM", "--clusters", "4"], "FISMCluster"),
        (["-m", "FISM", "--loss", "BPR"], "FISM"),
        (["-m", "BPRMF"], "BPRMF"),
        (["-m", "FPMC"], "FPMC"),
        (["-m", "Fossil"], "Fossil"),
        (["-m", "SDA"], "StackedDenoisingAutoencoder"),
        (["-m", "LTM"], "LTM"),
        (["-m", "POP"], "Pop"),
        (["-m", "MM"], "MarkovModel"),
        (["-m", "UKNN"], "UserKNN"),
    ],
)
def test_get_predictor_dispatch(argv, cls_name):
    predictor = parse.get_predictor(_args(argv))
    assert type(predictor).__name__ == cls_name


def test_rnn_flags_plumb_through():
    p = parse.get_predictor(
        _args(
            [
                "-m", "RNN", "--loss", "CCE", "--db", "0.5", "-r", "0.1",
                "--r_t", "LSTM", "--r_l", "30-20", "--max_length", "17",
                "-b", "9", "--u_m", "rmsprop", "--u_l", "0.3",
                "--n_dropout", "0.1", "--n_targets", "3",
            ]
        )
    )
    assert p.diversity_bias == 0.5
    assert p.regularization == 0.1
    assert p.recurrent_layer.layer_type == "LSTM"
    assert p.recurrent_layer.layers == [30, 20]
    assert p.max_length == 17
    assert p.batch_size == 9
    assert p.updater.name.startswith("Ur_lr0.3")
    assert p.sequence_noise.dropout == 0.1
    assert p.target_selection.n_targets == 3


def test_filename_encoding_matches_reference_shape():
    p = parse.get_predictor(_args(["-m", "RNN", "--loss", "CCE"]))
    fn = p._get_model_filename(3.5)
    # reference pattern: rnn_cce_db<..>_r<..>_ml<..>_bs<..>_ne<..>_<tower>_<updater>_<targets>...
    assert fn.startswith("rnn_cce_db0.0_r0.0_ml30_bs16_ne3.5_GRU_gc100_h50_Ua_lr0.001")
    assert "_nt1" in fn and fn.endswith("_nf")


def test_train_and_test_cli_end_to_end(synthetic_dataset, capsys):
    """Drive the real CLIs in-process on the CPU backend."""
    import test as test_cli
    import train as train_cli

    common = [
        "-d", str(synthetic_dataset), "-m", "RNN", "--loss", "CCE",
        "--r_t", "GRU", "--r_l", "8", "--max_length", "10", "-b", "8",
        "--u_l", "0.01",
    ]
    res = train_cli.main(common + ["--max_iter", "30", "--progress", "30", "--save", "All"])
    assert res[0]["sps"] is not None

    test_cli.main(common + ["--metrics", "sps,recall"])
    out = capsys.readouterr().out
    assert "sps@10" in out and "recall@10" in out


def test_train_cli_mesh_matches_single_device(synthetic_dataset):
    """`--mesh 4,2` on the virtual 8-device mesh must train to the same
    validation trajectory and the same checkpointed parameters as the
    single-device run (same seed → identical batch sampling; the sharded
    step is numerically the single-device step, tests/test_parallel.py)."""
    import glob

    import train as train_cli
    from seqrec_tpu.models.base import pytree_load

    common = [
        "-d", str(synthetic_dataset), "-m", "RNN", "--loss", "CCE",
        "--r_t", "GRU", "--r_l", "8", "--max_length", "10", "-b", "8",
        "--u_l", "0.01", "--max_iter", "24", "--progress", "12",
        "--save", "All", "--metrics", "sps,recall",
    ]
    res_a = train_cli.main(common + ["--dir", "mesh_a/"])
    res_b = train_cli.main(common + ["--dir", "mesh_b/", "--mesh", "4,2"])

    for m in ("sps", "recall", "ndcg", "item_coverage"):
        assert np.isclose(res_a[0][m], res_b[0][m], atol=1e-9), (m, res_a, res_b)

    fa = sorted(glob.glob(str(synthetic_dataset) + "models/mesh_a/*"))
    fb = sorted(glob.glob(str(synthetic_dataset) + "models/mesh_b/*"))
    assert fa and len(fa) == len(fb)
    ta, tb = pytree_load(fa[-1]), pytree_load(fb[-1])
    np.testing.assert_allclose(
        ta["params"]["W_out"], tb["params"]["W_out"], rtol=1e-4, atol=1e-5
    )


def test_test_cli_mesh_matches_single_device(synthetic_dataset, capsys):
    """test.py --mesh must report the same metrics as single-device eval
    (it reuses the mesh_a/ checkpoints from the training parity test)."""
    import test as test_cli

    common = [
        "-d", str(synthetic_dataset), "-m", "RNN", "--loss", "CCE",
        "--r_t", "GRU", "--r_l", "8", "--max_length", "10", "-b", "8",
        "--u_l", "0.01", "--dir", "mesh_a/", "--metrics", "sps,recall",
    ]
    test_cli.main(common)
    out_single = [
        l for l in capsys.readouterr().out.splitlines() if "sps@10" in l
    ]
    test_cli.main(common + ["--mesh", "4,2"])
    out_mesh = [
        l for l in capsys.readouterr().out.splitlines() if "sps@10" in l
    ]
    assert out_single and out_single == out_mesh


def test_train_cli_mesh_rejects_unsupported_model(synthetic_dataset):
    import train as train_cli

    # the lazy family has no device state at all — --mesh is an error
    with pytest.raises(ValueError, match="single-device"):
        train_cli.main(
            [
                "-d", str(synthetic_dataset), "-m", "POP",
                "--max_iter", "5", "--progress", "5", "--save", "None",
                "--mesh", "4,2",
            ]
        )


def test_train_cli_mesh_mf_eval_sharding(synthetic_dataset):
    """--mesh on an MF model trains single-device but runs the sharded
    eval top-k (MFBase.set_mesh); the run must complete with metrics."""
    import train as train_cli

    res = train_cli.main(
        [
            "-d", str(synthetic_dataset), "-m", "BPRMF",
            "--max_iter", "2000", "--progress", "2000", "--save", "None",
            "--mesh", "4,2",
        ]
    )
    assert res[0]["sps"] is not None


def test_load_last_model_resume(synthetic_dataset):
    import train as train_cli

    common = [
        "-d", str(synthetic_dataset), "-m", "RNN", "--loss", "CCE",
        "--r_t", "GRU", "--r_l", "8", "--max_length", "10", "-b", "8",
        "--u_l", "0.01", "--dir", "resume_test/",
    ]
    train_cli.main(common + ["--max_iter", "20", "--progress", "20", "--save", "All"])
    # second run resumes from the saved epoch and offsets the counter
    res = train_cli.main(
        common
        + ["--max_iter", "10", "--progress", "10", "--save", "None", "--load_last_model"]
    )
    assert res[0]["sps"] is not None


def test_profile_flag_writes_trace(synthetic_dataset, tmp_path):
    import train as train_cli

    trace_dir = str(tmp_path / "trace")
    train_cli.main(
        [
            "-d", str(synthetic_dataset), "-m", "RNN", "--loss", "CCE",
            "--r_t", "GRU", "--r_l", "8", "--max_length", "10", "-b", "8",
            "--u_l", "0.01", "--max_iter", "10", "--progress", "10",
            "--save", "None", "--profile", trace_dir,
        ]
    )
    import os

    assert os.path.isdir(trace_dir) and len(os.listdir(trace_dir)) > 0


def test_find_models_glob_rejects_other_family(tmp_path):
    """The epoch glob's ``ne*`` must capture ONLY the epoch number: the
    reference filename scheme omits defaulted tokens (LSTM tower), so a
    default-config pattern would otherwise swallow another family's
    checkpoints (observed: GRU params loaded into an LSTM -> KeyError)."""
    import types

    import numpy as np

    import test as test_cli

    models = tmp_path / "models"
    models.mkdir()
    lstm = "rnn_cce_db0.0_r0.0_ml30_bs8_ne2.5_gc100_h8_Ua_lr0.01_b10.9_b20.999_nt1_nf"
    gru = "rnn_cce_db0.0_r0.0_ml30_bs8_ne1.5_GRU_gc100_h8_Ua_lr0.01_b10.9_b20.999_nt1_nf"
    for f in (lstm, gru):
        (models / f).write_bytes(b"x")

    class P:
        def _get_model_filename(self, epochs):
            return f"rnn_cce_db0.0_r0.0_ml30_bs8_ne{epochs}_gc100_h8_Ua_lr0.01_b10.9_b20.999_nt1_nf"

    class G:
        def _get_model_filename(self, epochs):
            return f"rnn_cce_db0.0_r0.0_ml30_bs8_ne{epochs}_GRU_gc100_h8_Ua_lr0.01_b10.9_b20.999_nt1_nf"

    ds = types.SimpleNamespace(dirname=str(tmp_path) + "/")
    args = types.SimpleNamespace(
        method="RNN", number_of_batches="*", training_max_length=30,
        max_length=30, dir="",
    )
    got = test_cli.find_models(P(), ds, args)
    assert [f.split("/")[-1] for f in np.asarray(got).tolist()] == [str(models / lstm).split("/")[-1]]
    got = test_cli.find_models(G(), ds, args)
    assert [f.split("/")[-1] for f in np.asarray(got).tolist()] == [str(models / gru).split("/")[-1]]
