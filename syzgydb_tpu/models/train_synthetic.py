"""Contrastive training of the on-device embedder on a SYNTHETIC corpus.

The reference outsources text->vector to an external Ollama server
(/root/reference/embedding.go:50-104); our parity path does the same, and the
TPU-native alternative (models/embedder.py) needs trained weights to be
semantically useful.  This container has zero egress, so no pretrained
checkpoint or real corpus can be downloaded — instead we synthesize a
topical corpus with a planted similarity structure and train the encoder
contrastively until held-out text retrieval works end-to-end:

* A vocabulary of random word strings is partitioned into TOPICS plus a
  shared filler pool.  A "document" samples mostly same-topic words plus
  filler; a positive pair is two independent documents from one topic.
* InfoNCE over in-batch negatives (models/embedder.contrastive_loss) with
  every pair in a batch drawn from a DIFFERENT topic.
* The retrieval gate embeds held-out query documents against a candidate
  set with one same-topic document each: top-1 accuracy must clear the
  gate for a trained checkpoint and fails for random weights
  (tests/test_embedder.py pins both).

Run: python -m syzgydb_tpu.models.train_synthetic --out CKPT [--steps N]
The repo ships a pre-trained checkpoint at DEFAULT_CHECKPOINT; servers get
it with `embedder: device` + `embedder_checkpoint: <path>` (syzgy.conf).
"""

from __future__ import annotations

import argparse
import os
import string
import sys

import numpy as np

DEFAULT_CHECKPOINT = os.path.join(os.path.dirname(__file__), "checkpoints",
                                  "synthetic_minilm.ckpt")

N_TOPICS = 64
WORDS_PER_TOPIC = 24
N_FILLER = 256


def _words(rng: np.random.Generator, n: int) -> list[str]:
    letters = np.array(list(string.ascii_lowercase))
    out = []
    for _ in range(n):
        ln = int(rng.integers(3, 9))
        out.append("".join(rng.choice(letters, size=ln)))
    return out


def make_vocab(seed: int = 1234):
    """(topic word lists, shared filler words) — deterministic."""
    rng = np.random.default_rng(seed)
    words = _words(rng, N_TOPICS * WORDS_PER_TOPIC + N_FILLER)
    topics = [words[i * WORDS_PER_TOPIC:(i + 1) * WORDS_PER_TOPIC]
              for i in range(N_TOPICS)]
    filler = words[N_TOPICS * WORDS_PER_TOPIC:]
    return topics, filler


def sample_doc(rng: np.random.Generator, topic_words: list[str],
               filler: list[str]) -> str:
    """6-16 words, ~2/3 from the topic, rest filler, shuffled."""
    n = int(rng.integers(6, 17))
    n_topic = max(2, (2 * n) // 3)
    ws = list(rng.choice(topic_words, size=n_topic)) + \
        list(rng.choice(filler, size=n - n_topic))
    rng.shuffle(ws)
    return " ".join(ws)


def training_config():
    """Small config: trains in minutes on a single CPU core, checkpoint a
    few MB, yet solves the retrieval task decisively."""
    import jax.numpy as jnp
    from .embedder import EmbedderConfig
    return EmbedderConfig(vocab_size=8192, hidden=128, layers=2, heads=4,
                          mlp_dim=512, max_len=64, dtype=jnp.float32)


def retrieval_accuracy(embedder, seed: int = 777, n_queries: int = 64,
                       n_candidates: int = 256) -> float:
    """Held-out gate: each query document must retrieve the ONE candidate
    sharing its topic, top-1 by cosine, among distractors from other
    topics."""
    topics, filler = make_vocab()
    rng = np.random.default_rng(seed)
    hits = 0
    cand_topics = rng.permutation(N_TOPICS)[: min(N_TOPICS, n_candidates)]
    cands = [sample_doc(rng, topics[t], filler) for t in cand_topics]
    zc = embedder.embed(cands)
    for _ in range(n_queries):
        pos = int(rng.integers(0, len(cand_topics)))
        q = sample_doc(rng, topics[cand_topics[pos]], filler)
        zq = embedder.embed([q])[0]
        hits += int(np.argmax(zc @ zq) == pos)
    return hits / n_queries


def train(steps: int = 400, batch: int = 48, lr: float = 1e-3,
          seed: int = 0, log=print):
    """Train from scratch; returns the TextEmbedder with trained params."""
    import jax.numpy as jnp
    import optax

    from .embedder import TextEmbedder, contrastive_loss
    import jax

    emb = TextEmbedder(training_config(), seed=seed)
    topics, filler = make_vocab()
    rng = np.random.default_rng(seed + 1)
    tx = optax.adamw(lr)
    opt_state = tx.init(emb.params)

    @jax.jit
    def step(params, opt_state, ids_a, mask_a, ids_b, mask_b):
        loss, grads = jax.value_and_grad(contrastive_loss)(
            params, emb.model, ids_a, mask_a, ids_b, mask_b)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = emb.params
    for it in range(steps):
        ts = rng.permutation(N_TOPICS)[:batch]  # distinct topics per batch
        docs_a = [sample_doc(rng, topics[t], filler) for t in ts]
        docs_b = [sample_doc(rng, topics[t], filler) for t in ts]
        ids_a, mask_a = emb.tokenizer.batch_encode(docs_a)
        ids_b, mask_b = emb.tokenizer.batch_encode(docs_b)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(ids_a), jnp.asarray(mask_a),
            jnp.asarray(ids_b), jnp.asarray(mask_b))
        if it % 50 == 0 or it == steps - 1:
            log(f"step {it}: loss {float(loss):.4f}")
    emb.params = params
    return emb


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=DEFAULT_CHECKPOINT)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args(argv)

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    emb = train(steps=args.steps, batch=args.batch, lr=args.lr, log=log)
    acc = retrieval_accuracy(emb)
    log(f"held-out retrieval top-1 accuracy: {acc:.3f}")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    emb.save_checkpoint(args.out)
    log(f"checkpoint written: {args.out}")
    if acc < 0.9:
        log("WARNING: accuracy below the 0.9 gate")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
