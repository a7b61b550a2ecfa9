"""HF-format MiniLM/BERT checkpoint loader for the on-device embedder.

The reference's semantic-search quality comes from a real model served by
Ollama (all-minilm — /root/reference/embedding.go:50-104, settings.go:7).
This module closes the pretrained-weights gap for hosts that DO have a
local sentence-transformers/HF checkpoint (e.g. all-MiniLM-L6-v2): it
parses the HF directory layout (config.json + model.safetensors or
pytorch_model.bin + vocab.txt) with no network access, maps the BERT
tensor names onto the flax Encoder's bert-arch param tree, and returns a
WordPiece tokenizer built from the shipped vocab.

Numerical parity with transformers.BertModel (mean-pooled, L2-normalized —
the sentence-transformers recipe) is pinned in tests/test_embedder.py.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Optional

import numpy as np

# -- safetensors (dependency-free reader) -----------------------------------
# Format: u64 little-endian header length, JSON header
# {name: {"dtype", "shape", "data_offsets": [lo, hi]}, "__metadata__": ...},
# then one flat byte buffer the offsets index into.

_ST_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
}


def read_safetensors(path: str) -> dict[str, np.ndarray]:
    with open(path, "rb") as f:
        (hdr_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hdr_len).decode())
        buf = f.read()
    out: dict[str, np.ndarray] = {}
    for name, info in header.items():
        if name == "__metadata__":
            continue
        lo, hi = info["data_offsets"]
        raw = buf[lo:hi]
        dt = info["dtype"]
        if dt == "BF16":
            # bf16 = the high 16 bits of an f32
            u16 = np.frombuffer(raw, dtype=np.uint16)
            arr = (u16.astype(np.uint32) << 16).view(np.float32)
        else:
            if dt not in _ST_DTYPES:
                raise ValueError(f"unsupported safetensors dtype {dt!r}")
            arr = np.frombuffer(raw, dtype=_ST_DTYPES[dt])
        out[name] = arr.reshape(info["shape"]).copy()
    return out


def _load_torch_bin(path: str) -> dict[str, np.ndarray]:
    import torch
    state = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.to(torch.float32).numpy() for k, v in state.items()}


def load_state_dict(model_dir: str) -> dict[str, np.ndarray]:
    """Weights from an HF checkpoint directory, trying safetensors first."""
    st = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(st):
        return read_safetensors(st)
    pt = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(pt):
        return _load_torch_bin(pt)
    raise FileNotFoundError(
        f"no model.safetensors or pytorch_model.bin in {model_dir}")


# -- name/shape mapping ------------------------------------------------------


def _strip_prefix(state: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Drop a uniform 'bert.' / 'encoder.' wrapper prefix when present."""
    for prefix in ("bert.",):
        if any(k.startswith(prefix) for k in state):
            state = {k[len(prefix):] if k.startswith(prefix) else k: v
                     for k, v in state.items()}
    return state


def map_bert_params(state: dict[str, np.ndarray], cfg) -> dict:
    """HF BERT state dict -> flax params for Encoder(cfg, arch='bert').

    HF nn.Linear weights are (out, in); flax Dense kernels are (in, out).
    Attention projections reshape to flax's (hidden, heads, head_dim) /
    (heads, head_dim, hidden) DenseGeneral layout.  The position table is
    truncated to cfg.max_len (equivalent for sequences <= max_len)."""
    state = _strip_prefix(state)
    h, heads = cfg.hidden, cfg.heads
    hd = h // heads

    def get(name):
        if name not in state:
            raise KeyError(f"checkpoint missing tensor {name!r}")
        return np.asarray(state[name], dtype=np.float32)

    def ln(name):
        return {"scale": get(f"{name}.weight"), "bias": get(f"{name}.bias")}

    p: dict = {
        "Embed_0": {"embedding": get("embeddings.word_embeddings.weight")},
        "Embed_1": {"embedding":
                    get("embeddings.position_embeddings.weight")
                    [: cfg.max_len]},
        "Embed_2": {"embedding":
                    get("embeddings.token_type_embeddings.weight")},
        "LayerNorm_0": ln("embeddings.LayerNorm"),
    }
    for i in range(cfg.layers):
        pre = f"encoder.layer.{i}"
        attn = {}
        for proj in ("query", "key", "value"):
            w = get(f"{pre}.attention.self.{proj}.weight")  # (h, h) out,in
            b = get(f"{pre}.attention.self.{proj}.bias")
            attn[proj] = {"kernel": w.T.reshape(h, heads, hd),
                          "bias": b.reshape(heads, hd)}
        wo = get(f"{pre}.attention.output.dense.weight")     # (h, h)
        attn["out"] = {"kernel": wo.T.reshape(heads, hd, h),
                       "bias": get(f"{pre}.attention.output.dense.bias")}
        wi = get(f"{pre}.intermediate.dense.weight")         # (mlp, h)
        wo2 = get(f"{pre}.output.dense.weight")              # (h, mlp)
        p[f"Block_{i}"] = {
            "MultiHeadDotProductAttention_0": attn,
            "LayerNorm_0": ln(f"{pre}.attention.output.LayerNorm"),
            "Dense_0": {"kernel": wi.T,
                        "bias": get(f"{pre}.intermediate.dense.bias")},
            "Dense_1": {"kernel": wo2.T,
                        "bias": get(f"{pre}.output.dense.bias")},
            "LayerNorm_1": ln(f"{pre}.output.LayerNorm"),
        }
    return {"params": p}


def load_hf_minilm(model_dir: str, max_len: int = 128, dtype=None):
    """HF checkpoint directory -> ready TextEmbedder (bert arch, WordPiece
    tokenizer from vocab.txt).  Raises a clean error naming whatever is
    missing or malformed."""
    from .embedder import EmbedderConfig, TextEmbedder
    from .tokenizer import WordPieceTokenizer
    import jax.numpy as jnp

    cfg_path = os.path.join(model_dir, "config.json")
    if not os.path.exists(cfg_path):
        raise FileNotFoundError(f"no config.json in {model_dir}")
    with open(cfg_path) as f:
        hf = json.load(f)
    for key in ("hidden_size", "num_hidden_layers", "num_attention_heads",
                "intermediate_size", "vocab_size"):
        if key not in hf:
            raise ValueError(f"config.json missing {key!r} "
                             f"(not a BERT-family checkpoint?)")
    cfg = EmbedderConfig(
        vocab_size=int(hf["vocab_size"]),
        hidden=int(hf["hidden_size"]),
        layers=int(hf["num_hidden_layers"]),
        heads=int(hf["num_attention_heads"]),
        mlp_dim=int(hf["intermediate_size"]),
        max_len=min(max_len, int(hf.get("max_position_embeddings", max_len))),
        arch="bert",
        ln_eps=float(hf.get("layer_norm_eps", 1e-12)),
        dtype=dtype if dtype is not None else jnp.bfloat16,
    )
    vocab_path = os.path.join(model_dir, "vocab.txt")
    tokenizer: Optional[WordPieceTokenizer] = None
    if os.path.exists(vocab_path):
        tokenizer = WordPieceTokenizer.from_vocab_file(vocab_path,
                                                       cfg.max_len)
    emb = TextEmbedder(cfg, seed=0, tokenizer=tokenizer)
    state = load_state_dict(model_dir)
    import jax
    params = map_bert_params(state, cfg)
    # validate against the randomly-initialized tree: same structure, same
    # leaf shapes — a clean error beats a shape blowup deep inside jit
    want = jax.tree_util.tree_map(lambda a: (a.shape, "x"), emb.params)
    got = jax.tree_util.tree_map(lambda a: (a.shape, "x"), params)
    if want != got:
        raise ValueError(
            "checkpoint parameter tree does not match the bert-arch "
            f"Encoder built from config.json:\nwant {want}\ngot  {got}")
    emb.params = jax.tree_util.tree_map(jnp.asarray, params)
    return emb
