"""Host-side training loop — the TPU-native `ddgan.train` (ddgan.py:186-586).

Structure per epoch (reference parity):
  * loader.set_epoch (ddgan.py:430-431)
  * per batch: ONE jitted SPMD step = D update + G update + EMA
  * per-epoch cosine LR step (ddgan.py:524-526)
  * process-0 checkpointing: content every epoch, EMA netG every
    save_ckpt_every, losses.json append (ddgan.py:536-586)

`limited_iter` truncates epochs for smoke runs (ddgan.py:414-424).
kind_of_optim='pso' uses the gradient-free AdaptivePSO inner optimizer
(pso_optim.py) with the reference's accumulate->step-every->20-losses
protocol (ddgan.py:491-493, :513-515, :528-533).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import DataLoader, make_dataset
from ..diffusion import DiffusionCoefficients, PosteriorCoefficients
from ..models import NCSNpp, DiscriminatorSmall, DiscriminatorLarge
from ..parallel import make_mesh, shard_batch, replicate
from . import checkpoint as ckpt
from .optim import cosine_lr, make_optimizer
from .state import TrainState, create_train_state
from .step import make_train_step
from .pso_optim import AdaptivePSO
from .pso_step import make_pso_train_step, make_pso_epoch_end, pad_epoch_losses


def build_models(args):
    from ..models.ncsnpp import resolve_compute_dtype

    gen = NCSNpp.from_config(args)
    dtype = resolve_compute_dtype(getattr(args, "compute_dtype", "float32"))
    if str(getattr(args, "disc_small", "yes")).lower() == "yes":
        disc = DiscriminatorSmall(
            nc=2 * args.num_channels, ngf=args.ngf, t_emb_dim=args.t_emb_dim,
            dtype=dtype,
        )
    else:
        disc = DiscriminatorLarge(
            nc=2 * args.num_channels, ngf=args.ngf, t_emb_dim=args.t_emb_dim,
            dtype=dtype,
        )
    return gen, disc


def _limited_iter(args):
    """ddgan.py:414-424 semantics: int or list → iteration cutoff."""
    li = getattr(args, "limited_iter", "no")
    if isinstance(li, bool):
        return None
    if isinstance(li, int):
        return li
    if isinstance(li, list):
        return int(np.mean(li))
    return None


def build_loader(args, dataset, host_batch: int) -> DataLoader:
    """Host-sharded DataLoader with the reference's construction-failure
    fallback (ddgan.py:262-269) — factored out so the multi-host
    regression can exercise it directly."""
    try:
        loader = DataLoader(
            dataset,
            batch_size=host_batch,
            shuffle=True,
            drop_last=True,
            num_shards=jax.process_count(),
            shard_id=jax.process_index(),
            num_workers=getattr(args, "num_workers", 0),
            seed=int(args.seed),
        )
        len(loader)  # force index/shard validation now, like torch's ctor
        return loader
    except Exception as e:
        # fallback analog of ddgan.py:262-269: retry without the
        # distributed sampler (here: without host sharding). Only safe
        # single-process: with >1 hosts an unsharded retry would feed
        # every host the FULL dataset and silently change global batch
        # statistics, so re-raise instead.
        if jax.process_count() > 1:
            raise
        print("An error occurred when attempting to use the data loader:", e)
        return DataLoader(
            dataset,
            batch_size=host_batch,
            shuffle=True,
            drop_last=True,
            num_workers=getattr(args, "num_workers", 0),
            seed=int(args.seed),
        )


def resolve_optimizer_sharding(args) -> str:
    """'replicated' | 'zero1' from the config key, with the DDGAN_TPU_ZERO1
    env var as a documented trace-time override (bisect knob)."""
    env = os.environ.get("DDGAN_TPU_ZERO1")
    if env is not None:
        return "zero1" if env == "1" else "replicated"
    mode = str(getattr(args, "optimizer_sharding", "replicated")).lower()
    if mode not in ("replicated", "zero1"):
        raise ValueError(
            f"optimizer_sharding must be 'replicated' or 'zero1', got {mode!r}"
        )
    return mode


def build_optimizers(args, mesh):
    """The G/D gradient transformations for the adam path — replicated optax
    by default; `optimizer_sharding: "zero1"` shards the Adam moments over
    the data mesh axis (train/zero1.py; 2·P/n instead of 2·P optimizer
    bytes per chip, same trajectory — tests/test_zero1.py)."""
    if resolve_optimizer_sharding(args) == "zero1":
        from ..parallel.mesh import DATA_AXIS
        from .zero1 import make_zero1_optimizer

        # zero1's psum_scatter/all_gather run over the 'data' axis only, so
        # the shard count is that axis's size — NOT the whole mesh product
        # (they agree on today's 1-D mesh, but a second axis would silently
        # diverge; ADVICE r4).
        n_shards = int(mesh.shape[DATA_AXIS])
        tx_d = make_zero1_optimizer(
            args.beta1_d, args.beta2_d, args.weight_decay_D,
            args.grad_clip_norm, n_shards,
        )
        tx_g = make_zero1_optimizer(
            args.beta1_g, args.beta2_g, args.weight_decay_G,
            args.grad_clip_norm, n_shards,
        )
    else:
        tx_d = make_optimizer(
            args.beta1_d, args.beta2_d, args.weight_decay_D, args.grad_clip_norm
        )
        tx_g = make_optimizer(
            args.beta1_g, args.beta2_g, args.weight_decay_G, args.grad_clip_norm
        )
    return tx_g, tx_d


def train(args, dataset=None, mesh=None):
    """Run training. `args` is a Config or any attribute bag with the
    reference's schema. Returns the final TrainState."""
    is_pso = str(getattr(args, "kind_of_optim", "adam")).lower() == "pso"
    # EMA disabled for decay <= 0, like the reference (ema.py:33 apply_ema)
    use_ema = bool(args.use_ema) and float(args.ema_decay) > 0.0

    exp_path = Path("./saved_info/dd_gan") / str(args.dataset) / str(args.exp)
    exp_path.mkdir(parents=True, exist_ok=True)

    key = jax.random.PRNGKey(int(args.seed))

    if dataset is None:
        dataset = make_dataset(args)
    # args.batch_size means batch PER DEVICE, matching the reference's
    # per-GPU recipes (readme.md:29 "batch 64/GPU" on 4 GPUs = global 256):
    # each host loads batch_size × local_device_count and shard_batch then
    # gives every chip exactly batch_size samples.
    host_batch = int(args.batch_size) * jax.local_device_count()
    loader = build_loader(args, dataset, host_batch)

    gen, disc = build_models(args)

    coeff = DiffusionCoefficients.create(
        args.num_timesteps, args.beta_min, args.beta_max, args.use_geometric
    )
    pos_coeff = PosteriorCoefficients.create(
        args.num_timesteps, args.beta_min, args.beta_max, args.use_geometric
    )

    if mesh is None:
        mesh = make_mesh()

    if is_pso:
        pso = AdaptivePSO(
            swarm_size=20,
            inertia_weight=0.729,
            c1=1.49445, c1_min=1.0, c1_max=2.0,
            c2=1.49445, c2_min=1.0, c2_max=2.0,
            max_iter=args.num_epoch * max(1, len(loader)),
            velocity_clamp=(-1.0, 1.0),
            position_clamp=(-10.0, 10.0),
            threshold_low=0.2, threshold_high=0.5, c_adjust_step=0.05,
        )
        tx_g = tx_d = None
    else:
        tx_g, tx_d = build_optimizers(args, mesh)

    key, init_key = jax.random.split(key)
    image_shape = (args.image_size, args.image_size, args.num_channels)

    if is_pso:
        from .pso_step import create_pso_train_state
        # the EMA slot is ALWAYS allocated so the TrainState pytree
        # structure never depends on flag values — resuming a checkpoint
        # across an ema_decay change stays structurally compatible
        # (the reference tolerates EMA-state absence via dict lookup,
        # ddgan.py:408; a fixed pytree is the functional equivalent)
        state = create_pso_train_state(
            init_key, gen, disc, pso, image_shape, args.nz,
            batch=min(args.batch_size, 2), use_ema=True,
        )
        step_fn = make_pso_train_step(
            gen, disc, coeff, pos_coeff, pso,
            num_timesteps=args.num_timesteps, nz=args.nz,
            ema_decay=args.ema_decay, use_ema=use_ema, mesh=mesh,
        )
        pso_epoch_end = make_pso_epoch_end(pso)
    else:
        state = create_train_state(
            init_key, gen, disc, tx_g, tx_d, image_shape, args.nz,
            batch=min(args.batch_size, 2), use_ema=True,
        )
        r1_shared = str(getattr(args, "r1_shared", "auto")).lower()
        step_fn = make_train_step(
            gen, disc, coeff, pos_coeff,
            num_timesteps=args.num_timesteps, nz=args.nz,
            r1_gamma=args.r1_gamma, lazy_reg=args.lazy_reg,
            ema_decay=args.ema_decay, use_ema=use_ema,
            tx_g=tx_g, tx_d=tx_d, mesh=mesh, r1_shared=r1_shared,
        )
        d_only_step = None
        if int(getattr(args, "d_updates_per_g_update", 1)) > 1:
            d_only_step = make_train_step(
                gen, disc, coeff, pos_coeff,
                num_timesteps=args.num_timesteps, nz=args.nz,
                r1_gamma=args.r1_gamma, lazy_reg=args.lazy_reg,
                ema_decay=args.ema_decay, use_ema=use_ema,
                tx_g=tx_g, tx_d=tx_d, mesh=mesh, update_g=False,
                r1_shared=r1_shared,
            )

    init_epoch = 0
    if getattr(args, "resume", False) and (exp_path / "content.ckpt").exists():
        state = ckpt.load_content(exp_path, state)
        init_epoch = int(state.epoch)
        print(f"=> Loaded checkpoint (epoch {init_epoch})")

    from .zero1 import Zero1Optimizer, place_zero1_state

    if isinstance(tx_g, Zero1Optimizer) or isinstance(tx_d, Zero1Optimizer):
        state = place_zero1_state(mesh, state)
    else:
        state = replicate(mesh, state)

    limited = _limited_iter(args)
    losses_file = exp_path / "losses.json"
    # On resume, keep the pre-resume loss history (entries up to the resume
    # epoch). The reference restarts losses=[] and overwrites the file,
    # dropping earlier epochs (ddgan.py:571-586) — fixed to intent here,
    # quirk-ledgered in STATUS.md.
    losses = []
    if init_epoch > 0 and losses_file.exists():
        try:
            with open(losses_file) as f:
                losses = [e for e in json.load(f) if e.get("epoch", 0) <= init_epoch]
        except (json.JSONDecodeError, OSError):
            losses = []
    d_per_g = int(getattr(args, "d_updates_per_g_update", 1))

    for epoch in range(init_epoch, args.num_epoch + 1):
        loader.set_epoch(epoch)
        if is_pso or args.no_lr_decay:
            lr_g = jnp.asarray(args.lr_g, jnp.float32)
            lr_d = jnp.asarray(args.lr_d, jnp.float32)
        else:
            lr_g = cosine_lr(args.lr_g, epoch, args.num_epoch)
            lr_d = cosine_lr(args.lr_d, epoch, args.num_epoch)

        profile_dir = getattr(args, "profile_dir", None)
        if profile_dir and epoch == init_epoch and jax.process_index() == 0:
            # optional observability: the reference has no tracing at all
            # (SURVEY.md §5); this captures an XLA profile of the first
            # epoch for TensorBoard / xprof
            jax.profiler.start_trace(str(profile_dir))

        loss_values_D, loss_values_G = [], []
        epoch_t0 = time.perf_counter()
        for iteration, (x, _) in enumerate(loader):
            if limited is not None and iteration >= limited:
                break
            key, step_key = jax.random.split(key)
            batch = shard_batch(mesh, jnp.asarray(x))
            d_only = (
                not is_pso and d_per_g > 1 and (iteration % d_per_g) != d_per_g - 1
            )
            if d_only:
                state, metrics = d_only_step(state, batch, step_key, lr_g, lr_d)
            else:
                state, metrics = step_fn(state, batch, step_key, lr_g, lr_d)

            # keep metrics as device arrays — forcing float() here would
            # synchronize the host every iteration (costly through a
            # remote-device tunnel); one batched device_get happens at
            # epoch end
            loss_values_D.append(metrics.errD)
            if not d_only:  # d-only iterations have no G loss (errG=0 filler)
                loss_values_G.append(metrics.errG)

            if iteration % 100 == 0 and jax.process_index() == 0:
                print(
                    f"Epoch {epoch + 1}, Iteration {iteration}, "
                    f"G Loss: {float(metrics.errG):.8f}, "
                    f"D Loss: {float(metrics.errD):.8f}"
                )

        state = state.replace(epoch=jnp.asarray(epoch + 1, jnp.int32))
        loss_values_D = [float(v) for v in jax.device_get(loss_values_D)]
        loss_values_G = [float(v) for v in jax.device_get(loss_values_G)]

        if is_pso and loss_values_D:
            # epoch-end swarm update with the epoch's loss lists
            # (ddgan.py:528-533); also resets the in-epoch ring buffers
            key, ekey = jax.random.split(key)
            state = pso_epoch_end(
                state,
                replicate(mesh, jnp.asarray(pad_epoch_losses(loss_values_D, pso.swarm_size))),
                replicate(mesh, jnp.asarray(pad_epoch_losses(loss_values_G, pso.swarm_size))),
                replicate(mesh, ekey),
            )
        if profile_dir and epoch == init_epoch and jax.process_index() == 0:
            jax.profiler.stop_trace()

        if jax.process_index() == 0:
            # save_content/save_content_every are parsed-but-ignored by the
            # reference (always saves every epoch, ddgan.py:545-561); we
            # implement the documented intent (SURVEY.md §7 quirks).
            if bool(getattr(args, "save_content", True)) and (
                epoch % max(1, int(getattr(args, "save_content_every", 1))) == 0
            ):
                ckpt.save_content(exp_path, jax.device_get(state), args)
            if epoch % args.save_ckpt_every == 0:
                params = (
                    state.ema_G if (use_ema and state.ema_G is not None) else state.params_G
                )
                ckpt.save_netg(exp_path, epoch, jax.device_get(params),
                               jax.device_get(state.buffers_G))

            avg_d = float(np.mean(loss_values_D)) if loss_values_D else float("inf")
            avg_g = float(np.mean(loss_values_G)) if loss_values_G else float("inf")
            losses.append({"epoch": epoch + 1, "G_loss": avg_g, "D_loss": avg_d})
            with open(losses_file, "w") as f:
                json.dump(losses, f, indent=4)
            # final generator loss for the PSO HPO scorer. The reference
            # reads this file but never writes it (pso.py:415-420 — its
            # loss score degenerates); we implement the intent.
            with open(exp_path / "final_loss.txt", "w") as f:
                f.write(f"{avg_g}\n")
            dt = time.perf_counter() - epoch_t0
            n_it = len(loss_values_D)
            if n_it:
                print(
                    f"[epoch {epoch}] {n_it} iters in {dt:.1f}s "
                    f"({n_it / dt:.2f} it/s), G {avg_g:.4f} D {avg_d:.4f}"
                )

    return state
