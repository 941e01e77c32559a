"""Reproduce the 06830 GT-mismatch evidence plot (docs/06830_investigation.md)."""
import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
from genpc_tpu.io.ply import load_xyz

g, _ = load_xyz("/root/reference/data/GT/06830.ply")
p, _ = load_xyz("/root/reference/data/06830.ply")
rng = np.random.default_rng(0)
gi = rng.choice(len(g), 8000)
pi = rng.choice(len(p), 5000)
fig, axes = plt.subplots(2, 3, figsize=(15, 10))
for k, (a, b) in enumerate(((0, 1), (0, 2), (1, 2))):
    axes[0][k].scatter(g[gi, a], g[gi, b], s=0.5, c="red", alpha=0.5)
    axes[0][k].set_aspect("equal")
    axes[0][k].set_title("GT raw " + "xyz"[a] + "xyz"[b])
    axes[1][k].scatter(p[pi, a], p[pi, b], s=0.5, c="blue", alpha=0.5)
    axes[1][k].set_aspect("equal")
    axes[1][k].set_title("partial " + "xyz"[a] + "xyz"[b])
plt.savefig("/tmp/raw_06830.png", dpi=80)
print("saved /tmp/raw_06830.png")
