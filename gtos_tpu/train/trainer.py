"""Training driver: jitted train step, epoch loop, eval, checkpointing.

Reference counterpart: the epoch/step loop in generator/train.py of
jcyk/gtos (SURVEY.md §3.2): batchify -> forward -> backward -> clip ->
scheduled Adam step -> periodic dev eval + checkpoint. TPU re-design: the
whole update (grad + clip + Adam + schedule) is ONE donated jit program per
batch signature; gradient accumulation is optax.MultiSteps inside that same
program; data parallelism shards the batch over the mesh and jit inserts the
gradient psum (SURVEY.md §2.3 DP row) — there is no hand-written
average_gradients.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gtos_tpu.models.generator import Generator
from gtos_tpu.train.optim import make_optimizer
from gtos_tpu.utils.config import ModelConfig, TrainConfig
from gtos_tpu.utils.profiling import StepTimer


def _batch_edges_count(arrays) -> int:
    """Edges scored by the encoder for one batch: real edge-cell entries in
    sparse mode, B*N^2 ordered pairs in dense mode (the SpMM+SDDMM unit of
    BASELINE.json's north-star edges/s metric)."""
    if "edge_mask" in arrays:
        return int(np.asarray(arrays["edge_mask"]).sum())
    b, n = arrays["concept"].shape
    return b * n * n


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jnp.ndarray


def init_state(model: Generator, tx, example_arrays, seed: int) -> TrainState:
    rng = jax.random.PRNGKey(seed)
    p_rng, d_rng, loop_rng = jax.random.split(rng, 3)
    params = model.init({"params": p_rng, "dropout": d_rng},
                        example_arrays, deterministic=True)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=loop_rng,
    )


def make_train_step(model: Generator, tx) -> Callable:
    """One donated, jitted optimizer step. Recompiles per batch signature
    (bounded by the bucket ladder)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, arrays: Dict[str, jnp.ndarray]):
        rng, step_rng = jax.random.split(state.rng)

        def loss_fn(params):
            loss, metrics = model.apply(
                params, arrays, deterministic=False,
                rngs={"dropout": step_rng})
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = dict(metrics, grad_norm=gnorm)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1, rng=rng), metrics

    return train_step


def make_eval_step(model: Generator) -> Callable:
    @jax.jit
    def eval_step(params, arrays):
        loss, metrics = model.apply(params, arrays, deterministic=True)
        return metrics
    return eval_step


class Trainer:
    """Drives training over a DataLoader with periodic eval/checkpointing.

    Host-side loop; each batch dispatches one jitted step. Metrics go to a
    JSONL writer (gtos_tpu.utils.metrics)."""

    def __init__(
        self,
        model: Generator,
        model_cfg: ModelConfig,
        train_cfg: TrainConfig,
        example_arrays: Dict[str, np.ndarray],
        metrics_writer=None,
        checkpoint_manager=None,
        mesh=None,
        dev_bleu_fn: Optional[Callable] = None,
        prefetch: int = 2,
        max_inflight: int = 2,
    ):
        self.model = model
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        # extended target ids must fit the model's copy scatter; a mismatch
        # between the batchify OOV cap and ModelConfig.max_oov would produce
        # a silently-clamped (wrong) loss on TPU (VERDICT r1 weak #3)
        tok_out_max = int(np.max(example_arrays["token_out"]))
        assert tok_out_max < model_cfg.ext_vocab, (
            f"token_out id {tok_out_max} >= ext_vocab {model_cfg.ext_vocab}; "
            "the DataLoader's BucketSpec.max_oov must equal "
            "ModelConfig.max_oov (use BucketSpec.for_model_max_oov)")
        self.tx = make_optimizer(train_cfg, model_cfg.d_model)
        # attention_impl='auto': the best kernel is bucket-dependent
        # (benchmarks/train_step.json shows 6x regret for a pinned choice
        # at the wrong bucket), so train/eval steps are built lazily per
        # RESOLVED impl and dispatched per batch. All impls share one
        # parameter tree (the per-layer projections are identical), so the
        # TrainState moves freely between them.
        self._auto = model_cfg.attention_impl.startswith("auto")
        if self._auto:
            init_model = self._model_for(
                self._resolve(example_arrays))
        else:
            init_model = model
        self.state = init_state(init_model, self.tx, example_arrays,
                                train_cfg.seed)
        self.mesh = mesh
        # example_arrays fix the per-name input shardings for lazily-built
        # sharded steps (auto under a mesh, VERDICT r4 next #3); all impls
        # share one TrainState so per-impl steps dispatch freely
        self._example_arrays = example_arrays
        self._steps: Dict[str, Callable] = {}
        self._eval_steps: Dict[str, Callable] = {}
        if mesh is not None:
            if mesh.shape.get("model", 1) > 1:
                from gtos_tpu.parallel.tensor_parallel import shard_state
                self.state = shard_state(mesh, self.state)
            if not self._auto:
                from gtos_tpu.parallel.train import (
                    make_sharded_eval_step, make_sharded_train_step,
                )
                self.train_step = make_sharded_train_step(
                    model, self.tx, mesh, example_arrays,
                    example_state=self.state,
                    cp_schedule=model_cfg.cp_schedule)
                # eval must go through the SAME global-batch assembly and
                # shardings as training — a shardings-free jit either
                # crashes multi-process or scores zero-filled foreign rows
                # (VERDICT r3 weak #5)
                self.eval_step = make_sharded_eval_step(model, mesh)
        elif not self._auto:
            self.train_step = make_train_step(model, self.tx)
        if mesh is None and not self._auto:
            self.eval_step = make_eval_step(model)
        self.metrics = metrics_writer
        self.ckpt = checkpoint_manager
        self._resume_cursor = None
        # optional params -> dev BLEU hook (decode + sacrebleu), so config-2
        # parity is measurable during training (VERDICT r1 missing #5)
        self.dev_bleu_fn = dev_bleu_fn
        # input-pipeline overlap: batches are batchified + device_put
        # `prefetch` ahead in a background thread, and up to `max_inflight`
        # dispatched steps may be outstanding before the host reads a loss
        # back — the device queue never drains on host work (the reference
        # alternates host batchify and device step, SURVEY.md §3.2)
        self.prefetch = prefetch
        self.max_inflight = max_inflight

    def _resolve(self, arrays) -> str:
        from gtos_tpu.models.generator import resolve_attention_impl
        return resolve_attention_impl(self.model_cfg.attention_impl, arrays)

    def _model_for(self, impl: str) -> Generator:
        if impl == self.model_cfg.attention_impl:
            return self.model
        cfg = dataclasses.replace(self.model_cfg, attention_impl=impl)
        return Generator(cfg, cp_mesh=self.model.cp_mesh,
                         cp_axis=self.model.cp_axis)

    def _step_for(self, raw) -> Callable:
        """The train step for this batch (per-impl cache under 'auto').

        Under a mesh the per-impl steps are built with the SAME sharding
        spec (per-name, from the constructor's example_arrays) and share
        one TrainState — the auto dispatch works identically in DP/TP
        runs (VERDICT r4 weak #4)."""
        if not self._auto:
            return self.train_step
        impl = self._resolve(raw)
        if impl not in self._steps:
            if self.mesh is not None:
                from gtos_tpu.parallel.train import make_sharded_train_step
                self._steps[impl] = make_sharded_train_step(
                    self._model_for(impl), self.tx, self.mesh,
                    self._example_arrays, example_state=self.state,
                    cp_schedule=self.model_cfg.cp_schedule)
            else:
                self._steps[impl] = make_train_step(
                    self._model_for(impl), self.tx)
        return self._steps[impl]

    def _eval_step_for(self, raw) -> Callable:
        if not self._auto:
            return self.eval_step
        impl = self._resolve(raw)
        if impl not in self._eval_steps:
            if self.mesh is not None:
                from gtos_tpu.parallel.train import make_sharded_eval_step
                self._eval_steps[impl] = make_sharded_eval_step(
                    self._model_for(impl), self.mesh)
            else:
                self._eval_steps[impl] = make_eval_step(
                    self._model_for(impl))
        return self._eval_steps[impl]

    def _put(self, arrays):
        if self.mesh is None:
            return jax.device_put(arrays)
        from gtos_tpu.parallel.mesh import shard_arrays
        return shard_arrays(self.mesh, arrays,
                            cp_schedule=self.model_cfg.cp_schedule)

    def _prep(self, batch):
        """Host-side work per batch (runs in the prefetch thread): pack to
        numpy, then start the H2D transfer."""
        raw = batch.arrays()
        return raw, self._put(raw)

    def restore_if_available(self):
        if self.ckpt is not None:
            restored = self.ckpt.restore_latest(self.state)
            if restored is not None:
                self.state = restored
                # dataloader cursor: resume mid-epoch in the same
                # deterministic batch order instead of restarting the epoch
                self._resume_cursor = self.ckpt.load_cursor()
        return int(self.state.step)

    def fit(self, train_loader: Iterable, dev_loader=None,
            log_every: int = 50) -> Dict[str, float]:
        from collections import deque

        from gtos_tpu.data.prefetch import prefetch_iter

        cfg = self.train_cfg
        step = int(self.state.step)  # resume via restore_if_available()
        timer = StepTimer()
        timer.start()
        last: Dict[str, float] = {}
        batch_idx = 0
        skip = 0
        # (step, device metrics) of dispatched-but-unread steps; reading a
        # loss blocks until that step completes, so the deque keeps the host
        # `max_inflight` steps ahead of the device
        pending: deque = deque()
        drained = [None]  # (step, metrics, loss) of the newest read step

        def drain(to_len: int = 0):
            while len(pending) > to_len:
                s, m = pending.popleft()
                loss_val = float(m["loss"])
                if not np.isfinite(loss_val):
                    # fail fast with a resumable state on disk (SURVEY.md §5
                    # failure detection: restart from the last checkpoint)
                    if self.ckpt is not None:
                        self.ckpt.wait()
                    raise FloatingPointError(
                        f"non-finite loss {loss_val} at step {s}; "
                        "restart with --resume from the last checkpoint")
                drained[0] = (s, m, loss_val)

        if self._resume_cursor is not None and hasattr(train_loader, "epoch"):
            # replay the interrupted epoch's deterministic plan and skip
            # the batches already consumed before the checkpoint
            train_loader.epoch = self._resume_cursor["epoch"] - 1
            skip = self._resume_cursor["batch"]
            self._resume_cursor = None
        while step < cfg.total_steps:
            # drop resumed-past batches BEFORE _prep so deep mid-epoch
            # resumes don't pay batch packing + H2D per skipped batch
            # (ADVICE r2): islice consumes them from the loader without
            # entering the prefetch pipeline
            import itertools
            batch_idx = skip
            src = itertools.islice(iter(train_loader), skip, None)
            skip = 0
            for raw, arrays in prefetch_iter(src, self._prep,
                                             depth=self.prefetch):
                batch_idx += 1
                self.state, metrics = self._step_for(raw)(self.state,
                                                          arrays)
                step += 1
                pending.append((step, metrics))
                timer.step(n_tokens=int(raw["token_mask"].sum()),
                           n_edges=_batch_edges_count(raw))
                drain(self.max_inflight)
                if step % log_every == 0 or step == cfg.total_steps:
                    drain(0)
                    _, m, loss_val = drained[0]
                    rates = timer.rates()
                    last = {
                        "step": step,
                        "loss": loss_val,
                        "acc": float(m["acc"]),
                        "grad_norm": float(m["grad_norm"]),
                        "tokens_per_s": rates["tokens_per_s"],
                        "edges_per_s": rates["edges_per_s"],
                    }
                    if self.metrics is not None:
                        self.metrics.write(dict(last, kind="train"))
                if dev_loader is not None and step % cfg.eval_every == 0:
                    drain(0)
                    ev = self.evaluate(dev_loader)
                    if self.dev_bleu_fn is not None:
                        ev["dev_bleu"] = float(
                            self.dev_bleu_fn(self.state.params))
                    if self.metrics is not None:
                        self.metrics.write(dict(ev, step=step, kind="eval"))
                if self.ckpt is not None and step % cfg.checkpoint_every == 0:
                    drain(0)
                    self.ckpt.save(step, self.state, cursor={
                        "epoch": getattr(train_loader, "epoch", 0),
                        "batch": batch_idx})
                if step >= cfg.total_steps:
                    break
        drain(0)
        if self.ckpt is not None:
            self.ckpt.save(step, self.state, cursor={
                "epoch": getattr(train_loader, "epoch", 0),
                "batch": batch_idx})
            self.ckpt.wait()
        return last

    def evaluate(self, dev_loader) -> Dict[str, float]:
        tot_loss, tot_tok, tot_acc = 0.0, 0.0, 0.0
        for batch in dev_loader:
            raw = batch.arrays()
            # under a mesh the batch must be globally assembled (each host
            # ships the rows it built) with the training shardings
            m = self._eval_step_for(raw)(
                self.state.params,
                self._put(raw) if self.mesh is not None else raw)
            n = float(m["n_tok"])
            tot_loss += float(m["loss"]) * n
            tot_acc += float(m["acc"]) * n
            tot_tok += n
        ppl = float(np.exp(min(tot_loss / max(tot_tok, 1.0), 20.0)))
        return {"dev_loss": tot_loss / max(tot_tok, 1.0),
                "dev_acc": tot_acc / max(tot_tok, 1.0), "dev_ppl": ppl}
