"""DualVAE — sequential dual-VAE baseline with aspect disentanglement.

Behavior parity with reference ``code/REC/model/IDNet/dualvae.py``: items are
projected into A aspect-specific K-dim latents, filtered by softmax aspect
probabilities against learned topic prototypes; a *causal* attention-pooled
prefix summary per aspect feeds a VAE inference net (mu/softplus-std,
reparameterized in training, mean at eval); losses = masked causal NCE over
aspect-weighted cosine interactions + linearly annealed KL + aspect
contrastive (NRC) loss + topic orthogonality penalty.

Efficiency: the reference unfolds (B·A, L, L, K) causal windows
(dualvae.py:242-280); here the per-window masked softmax pooling telescopes
into cumulative sums exactly as in :mod:`comirec` (the attention score of
position j is window-independent).

The reference's eval gathers the representation at ``seq_len - 1``
(dualvae.py:458-466) which indexes a PAD slot for left-padded histories; we
use the true last position ``L - 1`` instead.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mhrec_tpu.models.layers import ItemEmbed, cosine_normalize, trunc_normal_init
from mhrec_tpu.models.losses import clamp_logit_scale
from mhrec_tpu.utils.enums import InputType

EPS = 1e-10

_ACTS = {"sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh, "silu": nn.silu, "relu": nn.relu}


def causal_masked_pooling(scores, values, mask):
    """Per-position causal masked-softmax pooling via cumsum.

    scores: [B, L, A]; values: [B, L, A, K]; mask: [B, L] bool.
    Returns pooled [B, L, A, K] where entry l pools over valid j ≤ l.
    """
    s = scores.astype(jnp.float32)
    m = jnp.max(jnp.where(mask[..., None], s, -jnp.inf), axis=1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.where(mask[..., None], jnp.exp(s - m), 0.0)      # [B, L, A]
    S1 = jnp.cumsum(e, axis=1)
    num = jnp.cumsum(e[..., None] * values.astype(jnp.float32), axis=1)
    return jnp.where(S1[..., None] > 0, num / jnp.clip(S1, 1e-20, None)[..., None], 0.0)


class DualVAE(nn.Module):
    item_num: int
    embedding_dim: int
    max_seq_length: int
    latent_dim: int = 32        # K
    num_aspects: int = 5        # A
    encoder_structure: tuple = (64,)
    act_fn: str = "tanh"
    dropout_rate: float = 0.2
    latent_dropout_rate: float = 0.2
    target_beta_kl: float = 0.01
    kl_anneal_steps: int = 10000
    gama_cl: float = 0.01
    cl_temp: float = 0.2
    aspect_temperature: float = 0.5
    ortho_lambda: float = 0.1
    nce_thres: float = 0.99
    fix_temp: bool = False

    input_type = InputType.SEQ
    medusa_num_heads = 1

    def setup(self):
        A, K, D = self.num_aspects, self.latent_dim, self.embedding_dim
        self.item_embedding = ItemEmbed(self.item_num, D, embedding_init=trunc_normal_init)
        self.position_embedding = nn.Embed(
            self.max_seq_length, D, embedding_init=trunc_normal_init
        )
        self.input_layernorm = nn.LayerNorm(epsilon=1e-12)
        self.input_dropout = nn.Dropout(self.dropout_rate)
        self.item_proj = nn.Dense(
            K * A, kernel_init=trunc_normal_init, bias_init=trunc_normal_init
        )
        self.item_topics = self.param(
            "item_topics",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-np.sqrt(1.0 / shape[1]), maxval=np.sqrt(1.0 / shape[1])
            ),
            (A, K),
        )
        hidden = max(16, K // 2)
        self.pool_hidden = nn.Dense(hidden, kernel_init=nn.initializers.xavier_uniform())
        self.pool_out = nn.Dense(1, use_bias=False, kernel_init=nn.initializers.xavier_uniform())
        self.pool_dropout = nn.Dropout(self.dropout_rate)
        self.inference_layers = [
            (
                nn.Dense(w, kernel_init=nn.initializers.xavier_uniform(), name=f"inf_fc{i}"),
                nn.LayerNorm(epsilon=1e-12, name=f"inf_ln{i}"),
                nn.Dropout(self.dropout_rate),
            )
            for i, w in enumerate(self.encoder_structure)
        ]
        self.user_mu = nn.Dense(K, kernel_init=nn.initializers.xavier_uniform())
        self.user_std = nn.Dense(K, kernel_init=nn.initializers.xavier_uniform())
        self.latent_dropout = nn.Dropout(self.latent_dropout_rate)
        if self.fix_temp:
            self.logit_scale_fixed = jnp.asarray(np.log(1 / 0.05), jnp.float32)
        else:
            self.logit_scale = self.param(
                "logit_scale", lambda k: jnp.asarray(np.log(1 / 0.05), jnp.float32)
            )

    def _scale(self):
        if self.fix_temp:
            return jnp.exp(self.logit_scale_fixed)
        return clamp_logit_scale(self.logit_scale)

    def _act(self, x):
        return _ACTS.get(self.act_fn, jnp.tanh)(x)

    # ------------------------------------------------------------------
    def _process_sequence(self, seq_items, deterministic):
        B, L = seq_items.shape
        x = self.item_embedding(seq_items)
        pos = self.position_embedding(jnp.arange(min(L, self.max_seq_length))[None, :])
        x = x + pos[:, :L]
        x = self.input_layernorm(x)
        return self.input_dropout(x, deterministic=deterministic)

    def _disentangle(self, embs):
        proj = self.item_proj(embs)
        return proj.reshape(*proj.shape[:-1], self.num_aspects, self.latent_dim)

    def _aspect_probs(self, dis_embs):
        n = cosine_normalize(dis_embs)
        t = cosine_normalize(self.item_topics)
        sim = jnp.einsum("...ak,ak->...a", n, t)
        return jax.nn.softmax(sim / self.aspect_temperature, axis=-1)

    def _infer_causal(self, input_seq_embs, seq_mask, deterministic, rng=None):
        """Causal user latents. Returns (z [B, L, A, K], kl [B, L, A])."""
        dis = self._disentangle(input_seq_embs)               # [B, L, A, K]
        probs = self._aspect_probs(dis)                       # [B, L, A]
        filtered = dis * probs[..., None]

        h = self._act(self.pool_hidden(filtered))
        h = self.pool_dropout(h, deterministic=deterministic)
        scores = self.pool_out(h).squeeze(-1)                 # [B, L, A]
        pooled = causal_masked_pooling(scores, filtered, seq_mask)  # [B, L, A, K]

        h = pooled
        for dense, ln, drop in self.inference_layers:
            h = drop(self._act(ln(dense(h))), deterministic=deterministic)
        mu = self.user_mu(h)                                  # [B, L, A, K]
        std = jax.nn.softplus(self.user_std(h)) + 1e-4
        kl = -0.5 * (1 + 2.0 * jnp.log(std + EPS) - mu**2 - std**2)
        kl = kl.sum(axis=-1)                                  # [B, L, A]
        if not deterministic and rng is not None:
            z = mu + jax.random.normal(rng, mu.shape) * std
            z = self.latent_dropout(z, deterministic=False)
        else:
            z = mu
        return z, kl

    # ------------------------------------------------------------------
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = False):
        items = batch["items"]
        user_mask = batch["masked_index"].astype(bool)
        L = self.max_seq_length
        step = batch.get("step", jnp.asarray(self.kl_anneal_steps))
        if self.kl_anneal_steps > 0:
            beta_kl = self.target_beta_kl * jnp.clip(
                (step + 1).astype(jnp.float32) / self.kl_anneal_steps, None, 1.0
            )
        else:
            beta_kl = jnp.asarray(self.target_beta_kl, jnp.float32)

        seq_items = jnp.where(user_mask[:, :L], items[:, :L], 0)
        pos_targets = items[:, 1 : L + 1]
        seq_mask = user_mask[:, :L]
        target_mask = user_mask[:, 1 : L + 1] & seq_mask

        x = self._process_sequence(seq_items, deterministic)
        rng = None if deterministic else self.make_rng("neg")
        z, kl = self._infer_causal(x, seq_mask, deterministic, rng)

        tm = target_mask.astype(jnp.float32)
        kl_loss = (kl * tm[..., None]).sum() / (tm.sum() * self.num_aspects + EPS)

        pos_dis = self._disentangle(self.item_embedding(pos_targets))   # [B, L, A, K]
        pos_probs = self._aspect_probs(pos_dis)

        neg_ids = batch["neg_items"][:, -1].reshape(-1)
        neg_dis = self._disentangle(self.item_embedding(neg_ids))       # [N, A, K]
        neg_probs = self._aspect_probs(neg_dis)

        z_n = cosine_normalize(z)
        pos_n = cosine_normalize(pos_dis)
        neg_n = cosine_normalize(neg_dis)

        pos_logits = jnp.einsum("blak,blak->bla", z_n, pos_n)
        pos_logits = (pos_logits * pos_probs).sum(-1)[..., None]        # [B, L, 1]
        neg_logits = jnp.einsum("blak,nak->blna", z_n, neg_n)
        neg_logits = (neg_logits * neg_probs[None, None]).sum(-1)       # [B, L, N]

        scale = self._scale().astype(jnp.float32)
        logits = jnp.concatenate([pos_logits, neg_logits], axis=-1) * scale
        ce = jax.scipy.special.logsumexp(logits, axis=-1) - logits[..., 0]
        cnt = jnp.clip(tm.sum(), 1.0, None)
        nce_loss = (ce * tm).sum() / cnt

        cl_loss = self._contrast_loss(z_n, pos_n, tm)
        ortho = self._ortho_loss()

        total = nce_loss + beta_kl * kl_loss + self.gama_cl * cl_loss + self.ortho_lambda * ortho
        model_out = {
            "loss": total,
            "kl_loss": jax.lax.stop_gradient(beta_kl * kl_loss),
            "cl_loss": jax.lax.stop_gradient(self.gama_cl * cl_loss),
            "ortho_loss": jax.lax.stop_gradient(self.ortho_lambda * ortho),
            "current_beta_kl": beta_kl,
        }
        beaten = (neg_logits * scale > pos_logits * scale).sum(-1)
        model_out["nce_samples"] = jnp.asarray(float(logits.shape[-1]))
        for kk in (1, 5, 10, 50, 100):
            if kk > logits.shape[-1]:
                break
            model_out[f"nce_top{kk}_acc"] = (
                ((beaten < kk).astype(jnp.float32) * tm).sum() / cnt
            )
        return model_out

    def _contrast_loss(self, z_n, pos_n, tm):
        """NRC aspect contrastive loss over valid tokens (dualvae.py:209-228),
        fixed-shape masked mean."""
        A = self.num_aspects
        pos_score = jnp.exp(jnp.einsum("blak,blak->bla", pos_n, z_n) / self.cl_temp)
        acl = jnp.einsum("blak,blck->blac", pos_n, z_n)  # target aspect a vs user aspect c
        eye = jnp.eye(A, dtype=bool)[None, None]
        acl = jnp.where(eye, jnp.finfo(jnp.float32).min, acl)
        neg_score = jnp.exp(acl / self.cl_temp).sum(-1)  # [B, L, A]
        token_loss = -jnp.log(pos_score / (neg_score + EPS))  # [B, L, A]
        cnt = jnp.clip(tm.sum() * A, 1.0, None)
        return (token_loss * tm[..., None]).sum() / cnt

    def _ortho_loss(self):
        t = cosine_normalize(self.item_topics)
        sim = t @ t.T
        return jnp.linalg.norm(sim - jnp.eye(self.num_aspects), ord="fro")

    # ------------------------------------------------------------------
    def predict_embeddings(self, item_seq, target_tags=None):
        seq_mask = item_seq != 0
        x = self._process_sequence(item_seq, deterministic=True)
        z, _ = self._infer_causal(x, seq_mask, deterministic=True)
        z_last = z[:, -1]                                   # [B, A, K]
        z_n = cosine_normalize(z_last)
        combined = z_n.reshape(z_n.shape[0], -1)            # [B, A*K]
        return {"head_embs": combined[:, None, :], "user_emb": combined}

    def score_items(self, head_embs, item_feats, item_tags, target_tags, switch_pred):
        scores = jnp.einsum("bhd,id->bhi", head_embs, item_feats)
        return scores * self._scale()

    def compute_item_all(self):
        all_ids = jnp.arange(self.item_num)
        dis = self._disentangle(self.item_embedding(all_ids))
        probs = self._aspect_probs(dis)
        weighted = cosine_normalize(dis) * probs[..., None]
        return weighted.reshape(self.item_num, -1)


def dualvae_from_config(config, dataload) -> DualVAE:
    size = config.get("vae_encoder_structure_size", "small")
    structure = {"large": (256, 128, 64), "medium": (128, 64)}.get(size, (64,))
    return DualVAE(
        item_num=dataload.item_num,
        embedding_dim=config["item_embedding_size"],
        max_seq_length=config["MAX_ITEM_LIST_LENGTH"],
        latent_dim=config.get("vae_latent_dim", 32),
        num_aspects=config.get("vae_num_aspects", 5),
        encoder_structure=structure,
        act_fn=config.get("vae_act_fn", "tanh"),
        dropout_rate=config.get("hidden_dropout_prob", 0.2) or 0.2,
        latent_dropout_rate=config.get("vae_latent_dropout", 0.2),
        target_beta_kl=config.get("vae_beta_kl", 0.1),
        kl_anneal_steps=config.get("vae_kl_anneal_steps", 10000),
        gama_cl=config.get("vae_gama_cl", 0.01),
        aspect_temperature=config.get("vae_aspect_temperature", 0.5),
        ortho_lambda=config.get("vae_ortho_lambda", 0.1),
        fix_temp=bool(config["fix_temp"]),
    )
