"""CLI driver smoke tests: train -> checkpoint -> work -> BLEU, both tasks
(the reference's train.py/work.py contract, SURVEY.md §3.2/§3.5)."""

import os

import pytest

from gtos_tpu.data.synthetic import (
    synthetic_amr_corpus, synthetic_dependency_corpus,
)
from gtos_tpu.infer.work import main as work_main
from gtos_tpu.train.train import main as train_main

_FAST = [
    "--d_model", "32", "--d_ff", "64", "--heads", "2", "--enc_layers", "1",
    "--dec_layers", "1", "--dropout", "0.0", "--total_steps", "60",
    "--warmup_steps", "30", "--batch_size_tokens", "512",
    "--eval_every", "60", "--checkpoint_every", "60",
    "--max_target_len", "64",
]


def _write_amr_testset(path, n=4):
    graphs, targets = synthetic_amr_corpus(n, seed=0, min_nodes=3, max_nodes=6)
    children = lambda g: [
        (s, l, t) for (s, l, t) in g.edges]
    with open(path, "w") as f:
        for g, t in zip(graphs, targets):
            kids = {}
            for (s, l, tt) in g.edges:
                kids.setdefault(s, []).append((l, tt))
            seen = set()

            def emit(n_):
                var = f"x{n_}"
                if n_ in seen:
                    return var
                seen.add(n_)
                parts = [f"({var} / {g.nodes[n_]}"]
                for (l, tt) in kids.get(n_, []):
                    parts.append(f":{l} {emit(tt)}")
                return " ".join(parts) + ")"

            f.write(f"# ::snt {' '.join(t)}\n{emit(0)}\n\n")


def _write_conll_testset(prefix, n=4):
    graphs, targets = synthetic_dependency_corpus(n, seed=1)
    with open(prefix + ".conll", "w") as f:
        for g in graphs:
            heads = {t: (s, l) for (s, l, t) in g.edges}
            for i, tok in enumerate(g.nodes):
                h, l = heads.get(i, (-1, "root"))
                f.write(f"{i + 1}\t{tok}\t{h + 1}\t{l}\n")
            f.write("\n")
    with open(prefix + ".tgt", "w") as f:
        f.writelines(" ".join(t) + "\n" for t in targets)


def test_train_work_amr(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    last = train_main(["--task", "amr", "--synthetic", "16",
                       "--ckpt_dir", ckpt] + _FAST)
    assert last["step"] == 60
    test_file = str(tmp_path / "test.amr")
    _write_amr_testset(test_file)
    out = str(tmp_path / "out.txt")
    score = work_main(["--ckpt_dir", ckpt, "--task", "amr",
                       "--test_data", test_file, "--output", out,
                       "--beam_size", "2", "--max_time_step", "20",
                       "--eval_bleu"])
    assert os.path.exists(out)
    assert score is not None and score >= 0.0


def test_train_work_nmt(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    last = train_main(["--task", "nmt", "--synthetic", "16",
                       "--ckpt_dir", ckpt] + _FAST)
    assert last["step"] == 60
    prefix = str(tmp_path / "test")
    _write_conll_testset(prefix)
    out = str(tmp_path / "out.txt")
    score = work_main(["--ckpt_dir", ckpt, "--task", "nmt",
                       "--test_data", prefix + ".conll",
                       "--test_target", prefix + ".tgt", "--output", out,
                       "--beam_size", "2", "--max_time_step", "20",
                       "--eval_bleu"])
    assert score is not None


def test_train_work_composed_flagship(tmp_path):
    """The README's composed flagship command line works end to end from
    the CLI: --attention_impl block_sparse --graph S trains (ring-CP with
    the Pallas tile kernel per step, interpret mode on the CPU mesh),
    checkpoints, and decodes (VERDICT r3 missing #1)."""
    ckpt = str(tmp_path / "ckpt")
    args = list(_FAST)
    args[args.index("--total_steps") + 1] = "6"
    args[args.index("--eval_every") + 1] = "6"
    args[args.index("--checkpoint_every") + 1] = "6"
    last = train_main(["--task", "amr", "--synthetic", "8",
                       "--ckpt_dir", ckpt,
                       "--attention_impl", "block_sparse_interpret",
                       "--graph", "2", "--dp", "4"] + args)
    assert last["step"] == 6
    import math
    assert math.isfinite(last["loss"])
    test_file = str(tmp_path / "test.amr")
    _write_amr_testset(test_file)
    out = str(tmp_path / "out.txt")
    score = work_main(["--ckpt_dir", ckpt, "--task", "amr",
                       "--test_data", test_file, "--output", out,
                       "--beam_size", "1", "--max_time_step", "10",
                       "--eval_bleu"])
    assert os.path.exists(out)
    assert score is not None and score >= 0.0


def test_graph_requires_sparse_impl(tmp_path):
    with pytest.raises(SystemExit):
        train_main(["--task", "amr", "--synthetic", "8",
                    "--ckpt_dir", str(tmp_path / "c"),
                    "--attention_impl", "xla", "--graph", "2"] + _FAST)


def test_train_resume(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    train_main(["--task", "amr", "--synthetic", "16",
                "--ckpt_dir", ckpt] + _FAST)
    # continue for 30 more steps from the saved checkpoint
    args = list(_FAST)
    args[args.index("--total_steps") + 1] = "90"
    last = train_main(["--task", "amr", "--synthetic", "16",
                       "--ckpt_dir", ckpt, "--resume"] + args)
    assert last["step"] == 90


def test_train_work_auto_impl(tmp_path):
    """--attention_impl auto end to end: per-batch kernel resolution in
    both the Trainer and the work.py decode path (VERDICT r3 next #6)."""
    ckpt = str(tmp_path / "ckpt")
    args = list(_FAST)
    args[args.index("--total_steps") + 1] = "6"
    args[args.index("--eval_every") + 1] = "6"
    args[args.index("--checkpoint_every") + 1] = "6"
    last = train_main(["--task", "amr", "--synthetic", "8",
                       "--ckpt_dir", ckpt,
                       "--attention_impl", "auto_interpret"] + args)
    assert last["step"] == 6
    test_file = str(tmp_path / "test.amr")
    _write_amr_testset(test_file)
    out = str(tmp_path / "out.txt")
    score = work_main(["--ckpt_dir", ckpt, "--task", "amr",
                       "--test_data", test_file, "--output", out,
                       "--beam_size", "1", "--max_time_step", "10",
                       "--eval_bleu"])
    assert os.path.exists(out)
    assert score is not None and score >= 0.0
