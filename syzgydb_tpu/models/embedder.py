"""On-device text embedding model.

A MiniLM-class transformer encoder (the shape of the reference's default
`all-minilm` Ollama model: 6 layers, 384 hidden, 12 heads — embedding.go uses
it purely as a remote black box) implemented in flax so embedding runs on the
TPU next to the vector index instead of over HTTP.  Mean-pooled, L2-normalized
sentence vectors; bf16 matmuls on the MXU.

Multi-chip: `shardings()` returns NamedSharding rules — batch over the 'data'
mesh axis (DP), MLP intermediate + attention heads over 'feature' (TP); the
contrastive `train_step` is jittable under those shardings and is exercised by
__graft_entry__.dryrun_multichip.

Weights are randomly initialized (zero-egress image: no pretrained checkpoint
available); load_pretrained() hooks a local HF checkpoint when present.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .tokenizer import HashingTokenizer


@dataclasses.dataclass(frozen=True)
class EmbedderConfig:
    vocab_size: int = 30522
    hidden: int = 384
    layers: int = 6
    heads: int = 12
    mlp_dim: int = 1536
    max_len: int = 128
    dtype: Any = jnp.bfloat16
    # "preln" = our trained-from-scratch arch (pre-LayerNorm, approximate
    # gelu); "bert" = HF MiniLM/BERT compatibility (post-LayerNorm blocks,
    # embeddings LayerNorm + token-type table, exact gelu) so real
    # pretrained checkpoints load with numerical parity (models/hf_loader)
    arch: str = "preln"
    ln_eps: float = 1e-6  # BERT checkpoints use 1e-12


class Block(nn.Module):
    cfg: EmbedderConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        attn_mask = mask[:, None, None, :] > 0
        if cfg.arch == "bert":
            # post-LN (BERT ordering): sublayer, residual, then LayerNorm
            h = nn.MultiHeadDotProductAttention(
                num_heads=cfg.heads, dtype=cfg.dtype, deterministic=True,
            )(x, x, mask=attn_mask)
            x = nn.LayerNorm(dtype=jnp.float32, epsilon=cfg.ln_eps)(x + h)
            h = nn.Dense(cfg.mlp_dim, dtype=cfg.dtype)(x)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(cfg.hidden, dtype=cfg.dtype)(h)
            return nn.LayerNorm(dtype=jnp.float32, epsilon=cfg.ln_eps)(x + h)
        h = nn.LayerNorm(dtype=jnp.float32, epsilon=cfg.ln_eps)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=cfg.heads, dtype=cfg.dtype, deterministic=True,
        )(h, h, mask=attn_mask)
        x = x + h
        h = nn.LayerNorm(dtype=jnp.float32, epsilon=cfg.ln_eps)(x)
        h = nn.Dense(cfg.mlp_dim, dtype=cfg.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(cfg.hidden, dtype=cfg.dtype)(h)
        return x + h


class Encoder(nn.Module):
    cfg: EmbedderConfig

    @nn.compact
    def __call__(self, ids, mask):
        cfg = self.cfg
        tok = nn.Embed(cfg.vocab_size, cfg.hidden, dtype=cfg.dtype)(ids)
        pos = nn.Embed(cfg.max_len, cfg.hidden, dtype=cfg.dtype)(
            jnp.arange(ids.shape[1])[None, :])
        x = (tok + pos).astype(cfg.dtype)
        if cfg.arch == "bert":
            # single-sentence inputs: token type 0 everywhere (the table
            # still loads both rows so HF checkpoints map 1:1)
            typ = nn.Embed(2, cfg.hidden, dtype=cfg.dtype)(
                jnp.zeros_like(ids))
            x = nn.LayerNorm(dtype=jnp.float32, epsilon=cfg.ln_eps)(
                x + typ).astype(cfg.dtype)
        for _ in range(cfg.layers):
            x = Block(cfg)(x, mask)
        if cfg.arch != "bert":
            x = nn.LayerNorm(dtype=jnp.float32, epsilon=cfg.ln_eps)(x)
        # masked mean pooling -> L2 normalize (sentence-transformers recipe)
        m = mask[:, :, None]
        pooled = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
        pooled = pooled.astype(jnp.float32)
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-9)


class TextEmbedder:
    """Host wrapper: tokenizer + jitted forward + optional train step."""

    def __init__(self, cfg: EmbedderConfig = EmbedderConfig(), seed: int = 0,
                 tokenizer=None):
        self.cfg = cfg
        # WordPieceTokenizer for HF checkpoints (real vocab), hashing
        # fallback otherwise — same batch_encode protocol
        self.tokenizer = tokenizer if tokenizer is not None else \
            HashingTokenizer(cfg.vocab_size, cfg.max_len)
        self.model = Encoder(cfg)
        ids = jnp.zeros((1, cfg.max_len), jnp.int32)
        mask = jnp.zeros((1, cfg.max_len), jnp.float32)
        self.params = self.model.init(jax.random.PRNGKey(seed), ids, mask)
        self._forward = jax.jit(self.model.apply)

    def embed(self, texts: list[str]) -> np.ndarray:
        ids, mask = self.tokenizer.batch_encode(texts)
        # pad batch to a power of two to bound jit cache size
        b = 1 << max(0, (len(texts) - 1).bit_length())
        if b != len(texts):
            ids = np.concatenate([ids, np.zeros((b - len(texts),
                                                 ids.shape[1]), ids.dtype)])
            mask = np.concatenate([mask, np.zeros((b - len(texts),
                                                   mask.shape[1]),
                                                  mask.dtype)])
        out = self._forward(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(out)[: len(texts)]

    def as_embed_text_fn(self):
        """Adapter matching the server's EmbedTextFunc seam
        (server/embedding.py) so searches/inserts embed on-device."""
        def fn(texts: list[str], use_cache: bool) -> list[list[float]]:
            return [v.tolist() for v in self.embed(texts)]
        return fn

    # -- checkpointing -------------------------------------------------------

    _CKPT_MAGIC = b"SYZE"

    def save_checkpoint(self, path: str) -> None:
        """Self-describing checkpoint: a small JSON config header followed
        by the flax msgpack params — from_checkpoint() reconstructs the
        matching Encoder without the caller knowing the architecture."""
        import json as _json

        import flax.serialization
        cfg = dataclasses.asdict(self.cfg)
        cfg["dtype"] = jnp.dtype(self.cfg.dtype).name
        hdr = _json.dumps(cfg).encode()
        with open(path, "wb") as f:
            f.write(self._CKPT_MAGIC)
            f.write(len(hdr).to_bytes(4, "little"))
            f.write(hdr)
            f.write(flax.serialization.to_bytes(self.params))

    @classmethod
    def from_checkpoint(cls, path: str) -> "TextEmbedder":
        """Load a save_checkpoint() file, reconstructing its config; a
        DIRECTORY loads as an HF-format MiniLM/BERT checkpoint
        (config.json + model.safetensors/pytorch_model.bin + vocab.txt —
        models/hf_loader.py); falls back to default-config raw-params
        loading for legacy blobs."""
        import json as _json
        import os as _os
        if _os.path.isdir(path):
            from .hf_loader import load_hf_minilm
            return load_hf_minilm(path)
        with open(path, "rb") as f:
            magic = f.read(4)
            if magic != cls._CKPT_MAGIC:
                emb = cls()
                emb.load_pretrained(path)
                return emb
            n = int.from_bytes(f.read(4), "little")
            cfg_d = _json.loads(f.read(n).decode())
            cfg_d["dtype"] = jnp.dtype(cfg_d["dtype"]).type
            emb = cls(EmbedderConfig(**cfg_d))
            import flax.serialization
            emb.params = flax.serialization.from_bytes(emb.params, f.read())
            return emb

    def load_pretrained(self, path: str) -> None:
        """Load checkpoint params into THIS instance's architecture: either
        a save_checkpoint() file (config header must match this Encoder's
        tree) or a raw flax msgpack params blob.  Without one, the embedder
        runs RANDOM weights — fine as a load/scale target, semantically
        meaningless for retrieval; the server logs it as experimental
        (server/rest.py)."""
        import flax.serialization
        with open(path, "rb") as f:
            blob = f.read()
        if blob[:4] == self._CKPT_MAGIC:
            n = int.from_bytes(blob[4:8], "little")
            blob = blob[8 + n:]
        self.params = flax.serialization.from_bytes(self.params, blob)


def contrastive_loss(params, model: Encoder, ids_a, mask_a, ids_b, mask_b,
                     temperature: float = 0.05):
    """InfoNCE over in-batch negatives (paired positive texts)."""
    za = model.apply(params, ids_a, mask_a)
    zb = model.apply(params, ids_b, mask_b)
    logits = za @ zb.T / temperature
    labels = jnp.arange(za.shape[0])
    li = -jnp.mean(jax.nn.log_softmax(logits, axis=1)[labels, labels])
    lj = -jnp.mean(jax.nn.log_softmax(logits, axis=0)[labels, labels])
    return 0.5 * (li + lj)


@functools.partial(jax.jit, static_argnames=("model",), donate_argnums=(0,))
def train_step(params, opt_state_unused, model: Encoder, ids_a, mask_a,
               ids_b, mask_b, lr: float = 1e-4):
    """One SGD contrastive step (full fwd+bwd) — the multi-chip dryrun
    target; optax wiring lives in train() for real runs."""
    loss, grads = jax.value_and_grad(contrastive_loss)(
        params, model, ids_a, mask_a, ids_b, mask_b)
    params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return params, loss


def make_optimizer(lr: float = 1e-4):
    import optax
    return optax.adamw(lr)


def embedder_shardings(mesh, params):
    """NamedSharding rules: TP over 'feature' for MLP + attention projections,
    everything else replicated.  Batch arrays shard over 'data' (DP)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def rule(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        joined = "/".join(str(n) for n in names)
        if leaf.ndim == 2:
            if "Dense_0" in joined:        # hidden -> mlp_dim: shard cols
                return NamedSharding(mesh, P(None, "feature"))
            if "Dense_1" in joined:        # mlp_dim -> hidden: shard rows
                return NamedSharding(mesh, P("feature", None))
        if leaf.ndim == 3 and ("query" in joined or "key" in joined
                               or "value" in joined):
            return NamedSharding(mesh, P(None, "feature", None))  # heads
        if leaf.ndim == 3 and "out" in joined:
            return NamedSharding(mesh, P("feature", None, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)
