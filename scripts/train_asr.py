#!/usr/bin/env python3
"""Train the tiny acoustic model whose weights ship as the engine's
m15 ASR kernel fixture (src/main/resources/graft/asr_tiny.txt).

A genuinely-trained model, not a synthetic kernel: full-batch gradient
descent on softmax regression over a synthetic phoneme dataset — K=6
classes (0 = CTC blank, 1..5 = phonemes), each an 8-dim integer
"spectral template" plus integer noise, the same frame recipe the m15
fixture synthesizes from the events table. After training, weights are
quantized to integers (x1000, rounded): logits become exact 64-bit
integer dot products, so the Spark kernel and the DuckDB oracle compute
bit-identical argmaxes (class probabilities survive quantization;
exactness is what puts a trained model under a hash gate).

Deterministic (fixed seed); the committed weights file is the artifact,
rerunning this script reproduces it byte-for-byte.

Usage: python3 scripts/train_asr.py  (writes the resource in place)
"""
import numpy as np

rng = np.random.default_rng(20260814)
K, D = 6, 8          # classes (0 = blank), feature dim
SCALE = 1000
N_PER = 400          # training frames per class

# class templates: the dataset recipe (shared with the m15 fixture);
# blank (class 0) is the near-silence template
tmpl = np.zeros((K, D), dtype=np.int64)
tmpl[1:] = rng.integers(-50, 51, size=(K - 1, D))

# training set: template + the same bounded integer noise family the
# fixture uses (uniform in [-3, 3])
X = np.concatenate([
    tmpl[c] + rng.integers(-3, 4, size=(N_PER, D)) for c in range(K)])
y = np.repeat(np.arange(K), N_PER)

# full-batch softmax regression, plain gradient descent
W = np.zeros((K, D))
b = np.zeros(K)
lr = 1e-2
for epoch in range(5000):
    z = X @ W.T + b                       # (N, K)
    z -= z.max(axis=1, keepdims=True)
    p = np.exp(z)
    p /= p.sum(axis=1, keepdims=True)
    p[np.arange(len(y)), y] -= 1.0        # dL/dz
    gW = p.T @ X / len(y)
    gb = p.sum(axis=0) / len(y)
    W -= lr * gW
    b -= lr * gb

acc = ((X @ W.T + b).argmax(axis=1) == y).mean()
Wq = np.rint(W * SCALE).astype(np.int64)
bq = np.rint(b * SCALE).astype(np.int64)
accq = ((X @ Wq.T + bq).argmax(axis=1) == y).mean()
print(f"train acc float={acc:.4f} quantized={accq:.4f}")
assert accq > 0.95, "quantized model must actually classify"

lines = [f"# tiny softmax acoustic model: dim {D} classes {K} scale {SCALE}",
         f"# trained by scripts/train_asr.py (seed 20260814), "
         f"quantized acc {accq:.4f}"]
lines += ["tmpl " + " ".join(map(str, row)) for row in tmpl]
lines += ["w " + " ".join(map(str, row)) for row in Wq]
lines += ["b " + " ".join(map(str, bq))]
out = "src/main/resources/graft/asr_tiny.txt"
import os
os.makedirs(os.path.dirname(out), exist_ok=True)
with open(out, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {out}")
