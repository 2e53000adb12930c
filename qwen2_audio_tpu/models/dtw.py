"""Token-level timestamp machinery: median filter + DTW alignment.

Parity with the reference's [EXPERIMENTAL] DTW scaffolding:
- alignment-head presets per model size (g_aheads, src/qwen2-whisper.cpp:372-401)
- median filter custom-op (:4112-4184 whisper_exp_compute_token_level_timestamps_dtw
  pipeline, median_filter :4031-4068)
- DTW + backtrace on the -log attention cost (:4070-4110)

The DP recurrence runs as a jax.lax.scan over anti-diagonal-free rows (the
classic O(N*M) table, vectorized over columns per row step); backtrace is a
host-side walk of the trace matrix (tiny).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# alignment-head presets: model name -> list of (text_layer, head)
# (data table mirroring g_aheads; heads from openai/whisper)
ALIGNMENT_HEADS_PRESETS: dict[str, list[tuple[int, int]]] = {
    "tiny": [(2, 2), (3, 0), (3, 2), (3, 3), (3, 4), (3, 5)],
    "base": [(3, 1), (4, 2), (4, 3), (4, 7), (5, 1), (5, 2), (5, 4), (5, 6)],
    "small": [(5, 3), (5, 9), (8, 0), (8, 4), (8, 7), (8, 8), (9, 0), (9, 7),
              (9, 9), (10, 5)],
    "medium": [(13, 15), (15, 4), (15, 15), (16, 1), (20, 0), (23, 4)],
    "large": [(9, 19), (11, 2), (11, 4), (11, 17), (22, 7), (22, 11),
              (22, 17), (23, 2), (23, 15)],
}


def median_filter(x: jnp.ndarray, width: int) -> jnp.ndarray:
    """Median over a sliding window along the last axis, edge-padded
    (≙ the ggml custom op median_filter, src/qwen2-whisper.cpp:4031-4068)."""
    assert width % 2 == 1, "median filter width must be odd"
    half = width // 2
    pad = [(0, 0)] * (x.ndim - 1) + [(half, half)]
    xp = jnp.pad(x, pad, mode="edge")
    windows = jnp.stack([xp[..., i:i + x.shape[-1]] for i in range(width)],
                        axis=-1)
    return jnp.median(windows, axis=-1)


def dtw_cost(attn: jnp.ndarray) -> jnp.ndarray:
    """(n_tokens, n_frames) alignment cost from attention weights:
    z-normalize per token, negate (reference :4131-4146)."""
    a = attn.astype(jnp.float32)
    mu = a.mean(axis=-1, keepdims=True)
    sd = a.std(axis=-1, keepdims=True) + 1e-9
    return -(a - mu) / sd


def dtw_and_backtrace(cost: np.ndarray) -> np.ndarray:
    """Classic DTW over an (N, M) cost matrix; returns the alignment path
    as (2, L) [token_idx, frame_idx] (reference dtw_and_backtrace
    :4070-4110). The table is tiny (tokens x frames); host DP is fine."""
    cost = np.asarray(cost, dtype=np.float64)
    N, M = cost.shape

    INF = np.inf
    D = np.full((N + 1, M + 1), INF)
    D[0, 0] = 0.0
    trace = np.zeros((N + 1, M + 1), dtype=np.int8)

    for n in range(1, N + 1):
        for m in range(1, M + 1):
            c0, c1, c2 = D[n - 1, m - 1], D[n - 1, m], D[n, m - 1]
            if c0 <= c1 and c0 <= c2:
                c, t = c0, 0
            elif c1 <= c0 and c1 <= c2:
                c, t = c1, 1
            else:
                c, t = c2, 2
            D[n, m] = cost[n - 1, m - 1] + c
            trace[n, m] = t

    # backtrace
    path = []
    n, m = N, M
    while n > 0 and m > 0:
        path.append((n - 1, m - 1))
        t = trace[n, m]
        if t == 0:
            n, m = n - 1, m - 1
        elif t == 1:
            n = n - 1
        else:
            m = m - 1
    path.reverse()
    return np.asarray(path, dtype=np.int32).T


def token_timestamps_from_attention(
    attn: np.ndarray,           # (n_heads, n_tokens, n_frames)
    n_frames_content: int,
    medfilt_width: int = 7,
    frames_per_second: float = 50.0,
) -> np.ndarray:
    """Per-token start times in seconds from cross-attention weights —
    the whisper DTW timestamp algorithm over our attention maps."""
    a = jnp.asarray(attn)[:, :, :n_frames_content]
    a = jax.nn.softmax(a, axis=-1)
    a = median_filter(a, medfilt_width)
    mean = a.mean(axis=0)                     # (n_tokens, n_frames)
    cost = np.asarray(dtw_cost(mean))
    path = dtw_and_backtrace(cost)            # (2, L)

    n_tokens = attn.shape[1]
    times = np.zeros(n_tokens, dtype=np.float64)
    seen = np.zeros(n_tokens, dtype=bool)
    for tok, frame in zip(path[0], path[1]):
        if not seen[tok]:
            times[tok] = frame / frames_per_second
            seen[tok] = True
    return times
