"""Training driver: dataset, optimizer schedule, checkpoint/resume loop.

Reference: JacobiForcing/train/soft_flexattn_train_cllm.py:36-292 (+ the
_multiblock / _multiblock_window entry variants — here a single driver with
`variant` / `window_size` args).  DeepSpeed ZeRO-3 + Accelerate become
mesh-sharded params + optax; HF Trainer becomes a plain step loop.

Checkpoint layout: <output_dir>/checkpoint-<step>/ with HF-format
model.safetensors + config.json (so the serving engine loads it directly, like
the reference's merged checkpoints) plus optimizer state; resume picks the
latest checkpoint-* (reference trainer:281-284).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from jacobiforcing_tpu.models.qwen import ModelConfig, init_params, rope_table
from jacobiforcing_tpu.train.consistency import (
    TrainConfig,
    make_train_step,
    prepare_sample,
)
from jacobiforcing_tpu.utils.loader import load_checkpoint, save_checkpoint


@dataclasses.dataclass
class TrainerArgs:
    target_model_path: str = ""
    data_path: str = ""
    output_dir: str = "out"
    max_new_tokens: int = 32  # N
    variant: str = "single"
    window_size: int = 4
    attn_impl: str = "dense"  # "splash" for block-sparse 16k-scale packs
    learning_rate: float = 1e-5
    min_lr_ratio: float = 0.05  # cosine floor (reference: 1e-5 -> 5e-7)
    warmup_steps: int = 10
    num_epochs: int = 1
    max_steps: int = -1
    save_steps: int = 500
    log_steps: int = 10
    seed: int = 0
    distill_temperature: float = 1.0
    seq_bucket: int = 4096
    resume: bool = True
    # Global batch: packed samples consumed per optimizer step.  With a mesh,
    # samples shard over the "data" axis (the reference's torchrun 4-8 rank
    # data parallelism); 0 = auto (one sample per data-axis row).
    global_batch: int = 0


class JacobianDataset:
    """Lazy JSONL rows: {prompt_ids, prompt_ids_len, complete_training_sequence_ids,
    traj_position_indices} (reference soft_flexattn_train_cllm.py JacobianDataset,
    data contract from 2_prepare_..._progressive_noise_window.py:265-271)."""

    def __init__(self, path: str):
        self.rows: List[dict] = []
        with open(path) as f:
            first = f.read(1)
            f.seek(0)
            if first == "[":
                self.rows = json.load(f)
            else:
                for line in f:
                    line = line.strip()
                    if line:
                        self.rows.append(json.loads(line))

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, i) -> dict:
        r = self.rows[i]
        return {
            "input_ids": r["complete_training_sequence_ids"],
            "prompt_len": int(r["prompt_ids_len"]),
            "T": len(r["traj_position_indices"]),
        }


def _wandb_log(metrics: Dict[str, float]) -> None:
    """wandb train-loss logging when WANDB_PROJECT is set (reference
    soft_flexattn_cllm_trainer.py:557-559); silently skipped otherwise."""
    if not os.environ.get("WANDB_PROJECT"):
        return
    try:
        import wandb

        if wandb.run is None:
            wandb.init(project=os.environ["WANDB_PROJECT"])
        wandb.log(metrics)
    except Exception:
        pass


def latest_checkpoint(output_dir: str) -> Optional[str]:
    if not os.path.isdir(output_dir):
        return None
    cands = [
        d for d in os.listdir(output_dir)
        if d.startswith("checkpoint-") and os.path.isdir(os.path.join(output_dir, d))
    ]
    if not cands:
        return None
    latest = max(cands, key=lambda d: int(d.split("-")[1]))
    return os.path.join(output_dir, latest)


def save_train_checkpoint(path: str, cfg: ModelConfig, params, opt_state, step: int):
    from flax import serialization

    os.makedirs(path, exist_ok=True)
    save_checkpoint(path, cfg, params)
    with open(os.path.join(path, "opt_state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(opt_state))
    with open(os.path.join(path, "trainer_state.json"), "w") as f:
        json.dump({"step": step}, f)


def load_train_checkpoint(path: str, cfg: ModelConfig, opt_template):
    from flax import serialization

    _, params = load_checkpoint(path, dtype=cfg.dtype)
    with open(os.path.join(path, "opt_state.msgpack"), "rb") as f:
        opt_state = serialization.from_bytes(opt_template, f.read())
    with open(os.path.join(path, "trainer_state.json")) as f:
        step = json.load(f)["step"]
    return params, opt_state, step


def train(
    args: TrainerArgs,
    *,
    model_cfg: Optional[ModelConfig] = None,
    params: Optional[Dict[str, Any]] = None,
    dataset: Optional[Any] = None,
    eos_id: int = -1,
    pad_id: int = 0,
    mesh=None,
    log_fn=print,
) -> Dict[str, Any]:
    """Run the training loop; returns {params, metrics_history}.

    With a `mesh`, params are fsdp-sharded over "data" (ZeRO-3 analog) and
    each optimizer step consumes `global_batch` packed samples sharded over
    the data axis (reference: torchrun ranks + DeepSpeed,
    train_jacobi_forcing_coder_n32.sh:10-38)."""
    if params is None:
        if args.target_model_path:
            model_cfg, params = load_checkpoint(args.target_model_path)
        else:
            assert model_cfg is not None
            params = init_params(model_cfg, jax.random.PRNGKey(args.seed))
    dataset = dataset if dataset is not None else JacobianDataset(args.data_path)
    rope = rope_table(model_cfg)

    gb = 1
    if mesh is not None:
        dp = mesh.shape.get("data", 1)
        gb = args.global_batch if args.global_batch > 0 else dp
        assert gb % dp == 0, f"global_batch {gb} not divisible by dp={dp}"
        if gb > 1:
            assert args.attn_impl == "dense", (
                "data-parallel batching shares one static layout; use dense "
                "attention (splash layouts are per-sample)"
            )
        from jacobiforcing_tpu.parallel.sharding import shard_params

        params = shard_params(params, model_cfg, mesh, fsdp=True)

    # max_steps (when set) is authoritative; otherwise num_epochs bounds
    steps_per_epoch = max(len(dataset) // gb, 1)
    if args.max_steps > 0:
        n_total = args.max_steps
        n_epochs = (args.max_steps + steps_per_epoch - 1) // steps_per_epoch + 1
    else:
        n_total = steps_per_epoch * args.num_epochs
        n_epochs = args.num_epochs
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=args.learning_rate,
        warmup_steps=min(args.warmup_steps, max(n_total // 10, 1)),
        decay_steps=max(n_total, 1),
        end_value=args.learning_rate * args.min_lr_ratio,
    )
    optimizer = optax.adamw(schedule, b1=0.9, b2=0.95)

    tc = TrainConfig(
        N=args.max_new_tokens,
        variant=args.variant,
        window_size=args.window_size,
        ar_weight=10.0 if args.variant == "single" else 1.0,
        distill_temperature=args.distill_temperature,
        seq_bucket=args.seq_bucket,
        attn_impl=args.attn_impl,
    )
    step_fn = make_train_step(model_cfg, tc, optimizer, mesh)
    opt_state = optimizer.init(params)

    start_step = 0
    if args.resume:
        ckpt = latest_checkpoint(args.output_dir)
        if ckpt:
            params, opt_state, start_step = load_train_checkpoint(ckpt, model_cfg, opt_state)
            log_fn(f"[train] resumed from {ckpt} at step {start_step}")

    history: List[Dict[str, float]] = []
    step = start_step
    t0 = time.perf_counter()
    order = np.arange(len(dataset))
    done = False
    for epoch in range(n_epochs):
        if done:
            break
        np.random.RandomState(args.seed + epoch).shuffle(order)
        for g in range(0, len(order) - gb + 1, gb):
            if step >= n_total:
                done = True
                break
            rows = [dataset[int(i)] for i in order[g : g + gb]]
            samples = [
                prepare_sample(
                    r["input_ids"], r["prompt_len"], r["T"], tc,
                    eos_id=eos_id, pad_id=pad_id,
                )
                for r in rows
            ]
            if mesh is None:
                batch_np = samples[0]
                batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
            else:
                batch_np = samples[0]
                batch = {
                    k: jnp.asarray(np.stack([s[k] for s in samples]))
                    for k in samples[0]
                }
            layout = (
                (int(batch_np["prompt_len"]), int(batch_np["T"]), int(batch_np["seq_len"]))
                if tc.attn_impl == "splash" else None
            )
            params, opt_state, metrics = step_fn(params, opt_state, rope, batch, layout)
            step += 1
            if step % args.log_steps == 0 or step == n_total:
                m = {k: float(v) for k, v in metrics.items()}
                m["step"] = step
                m["steps_per_s"] = step / max(time.perf_counter() - t0, 1e-9)
                history.append(m)
                log_fn(f"[train] {m}")
                _wandb_log(m)
            if args.save_steps > 0 and step % args.save_steps == 0:
                save_train_checkpoint(
                    os.path.join(args.output_dir, f"checkpoint-{step}"),
                    model_cfg, params, opt_state, step,
                )
    if args.output_dir:
        save_train_checkpoint(
            os.path.join(args.output_dir, f"checkpoint-{step}"),
            model_cfg, params, opt_state, step,
        )
    return {"params": params, "history": history, "step": step}
