"""Distributed RVC training step (GAN) over a jax.sharding mesh.

One jitted step runs both GAN sides: discriminator update on (real, fake)
and generator update with adversarial + feature-matching + mel + KL losses
(upstream VITS/RVC recipe; the graph components are the reference's unused
training classes, src/infer_pack/models.py:617-632, 958-1124).

Parallelism:
  * batch arrays sharded on mesh axis "data" -> gradients all-reduce over
    ICI automatically (GSPMD: replicated params + sharded batch);
  * the text-encoder FFN/attention weights carry "model"-axis sharding
    constraints, giving tensor parallelism on the wide matmuls when the
    mesh has model_parallel > 1.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .tp import _tp_param_spec
from ..models.discriminators import init_mpd_params, multi_period_discriminator
from ..models.rvc import RVCConfig
from ..models.rvc_train import (
    MelLoss,
    discriminator_adv_loss,
    feature_matching_loss,
    generator_adv_loss,
    init_synthesizer_params,
    kl_loss,
    slice_segments2,
    synthesizer_forward,
)




def param_shardings(params: dict, mesh: Mesh, tensor_parallel: bool):
    def walk(node, parts):
        if isinstance(node, dict):
            return {k: walk(v, parts + (k,)) for k, v in node.items()}
        spec = _tp_param_spec(parts, node) if tensor_parallel else P()
        return NamedSharding(mesh, spec)

    return walk(params, ())


@dataclass
class TrainState:
    gen_params: dict
    disc_params: dict
    gen_opt_state: object
    disc_opt_state: object
    step: int = 0


def make_train_step(cfg: RVCConfig, mesh: Mesh, learning_rate: float = 1e-4):
    """Returns (init_state, step_fn).  step_fn is jitted with sharded batch
    inputs; batch = dict(phone, pitch, pitchf, spec, wav, lengths, sid)."""
    gen_opt = optax.adamw(learning_rate, b1=0.8, b2=0.99)
    disc_opt = optax.adamw(learning_rate, b1=0.8, b2=0.99)
    mel_loss = MelLoss(cfg.sr)
    upp = cfg.upp

    def gen_loss_fn(gen_params, disc_params, batch, rng):
        o, ids_slice, _x_mask, y_mask, latents = synthesizer_forward(
            gen_params, cfg,
            batch["phone"], batch["lengths"], batch["pitch"], batch["pitchf"],
            batch["spec"], batch["lengths"], batch["sid"], rng,
        )
        z, z_p, m_p, logs_p, m_q, logs_q = latents
        wav_slice = slice_segments2(
            batch["wav"], ids_slice * upp, cfg.segment_size * upp
        )[:, None, :]
        _yr, y_dg, fmap_r, fmap_g = multi_period_discriminator(
            disc_params, wav_slice, o, version=cfg.version
        )
        loss_mel = mel_loss(wav_slice[:, 0], o[:, 0])
        loss_kl = kl_loss(z_p, logs_q, m_p, logs_p, y_mask)
        loss_fm = feature_matching_loss(fmap_r, fmap_g)
        loss_adv = generator_adv_loss(y_dg)
        total = loss_mel + loss_kl + loss_fm + loss_adv
        return total, (o, wav_slice, loss_mel, loss_kl)

    def disc_loss_fn(disc_params, real, fake):
        y_dr, y_dg, _fr, _fg = multi_period_discriminator(
            disc_params, real, jax.lax.stop_gradient(fake), version=cfg.version
        )
        return discriminator_adv_loss(y_dr, y_dg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state: TrainState, batch, rng):
        (gen_loss, (o, wav_slice, loss_mel, loss_kl)), gen_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(state.gen_params, state.disc_params, batch, rng)
        disc_loss, disc_grads = jax.value_and_grad(disc_loss_fn)(
            state.disc_params, wav_slice, o
        )
        gen_updates, gen_opt_state = gen_opt.update(
            gen_grads, state.gen_opt_state, state.gen_params
        )
        disc_updates, disc_opt_state = disc_opt.update(
            disc_grads, state.disc_opt_state, state.disc_params
        )
        new_state = TrainState(
            gen_params=optax.apply_updates(state.gen_params, gen_updates),
            disc_params=optax.apply_updates(state.disc_params, disc_updates),
            gen_opt_state=gen_opt_state,
            disc_opt_state=disc_opt_state,
            step=state.step + 1,
        )
        metrics = {
            "loss/gen_total": gen_loss,
            "loss/disc": disc_loss,
            "loss/mel": loss_mel,
            "loss/kl": loss_kl,
        }
        return new_state, metrics

    def init_state(seed: int = 0, tensor_parallel: bool = False) -> TrainState:
        gen_params = init_synthesizer_params(cfg, seed)
        disc_params = init_mpd_params(cfg.version, seed + 1)
        gp_shard = param_shardings(gen_params, mesh, tensor_parallel)
        dp_shard = param_shardings(disc_params, mesh, False)
        gen_params = jax.device_put(gen_params, gp_shard)
        disc_params = jax.device_put(disc_params, dp_shard)
        return TrainState(
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt_state=gen_opt.init(gen_params),
            disc_opt_state=disc_opt.init(disc_params),
        )

    return init_state, step_fn


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.gen_params, s.disc_params, s.gen_opt_state, s.disc_opt_state, s.step), None),
    lambda _aux, kids: TrainState(*kids),
)


def make_synthetic_batch(cfg: RVCConfig, batch_size: int, frames: int, seed: int = 0):
    """A shaped random training batch (dryruns/tests)."""
    rng = np.random.default_rng(seed)
    emb_dim = 768 if cfg.version == "v2" else 256
    return {
        "phone": rng.standard_normal((batch_size, frames, emb_dim)).astype(np.float32) * 0.1,
        "pitch": rng.integers(1, 255, (batch_size, frames)).astype(np.int64),
        "pitchf": rng.uniform(80, 400, (batch_size, frames)).astype(np.float32),
        "spec": rng.standard_normal((batch_size, cfg.spec_channels, frames)).astype(np.float32)
        * 0.1,
        "wav": (rng.standard_normal((batch_size, frames * cfg.upp)) * 0.1).astype(np.float32),
        "lengths": np.full((batch_size,), frames, np.int64),
        "sid": rng.integers(0, cfg.spk_embed_dim, (batch_size,)).astype(np.int64),
    }
