"""Diagnostic plots: alignment heatmaps and VAD overlays.

Counterpart of the reference's matplotlib observability (alignment heatmap +
word boundaries at ``transcribe.py:1586-1646``, VAD overlay at
``transcribe.py:2139-2151``): when ``plot`` is a path, figures are saved as
``<plot>.alignment%03d.jpg`` / ``<plot>.VAD.jpg``; otherwise shown.
"""

from __future__ import annotations

from typing import List

import numpy as np

num_alignment_for_plot = 0


def reset_plot_counter() -> None:
    """Called at the start of each transcription so figure numbering restarts
    at 001 per call (reference ``transcribe.py:300-301``)."""
    global num_alignment_for_plot
    num_alignment_for_plot = 0


def plot_alignment(
    cost: np.ndarray,  # (n_tokens, span) negative-similarity cost matrix
    index1s: np.ndarray,
    index2s: np.ndarray,
    words: List[dict],
    start_time: float,
    plot,
) -> None:
    global num_alignment_for_plot
    num_alignment_for_plot += 1
    import matplotlib

    if isinstance(plot, str):
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(16, 9))
    plt.imshow(-cost, aspect="auto", origin="upper")
    plt.plot(index2s, index1s, color="red")
    for w in words:
        x = (w["start"] - start_time) / 0.02
        plt.axvline(x, color="red", linestyle="dotted")
        plt.text(x, -0.5, w["text"], color="red", ha="left", va="bottom")
    plt.xlabel("Time (20ms positions)")
    plt.ylabel("Tokens")
    if isinstance(plot, str):
        plt.savefig(f"{plot}.alignment{num_alignment_for_plot:03d}.jpg",
                    bbox_inches="tight", pad_inches=0)
        plt.close()
    else:  # pragma: no cover - interactive
        plt.show()


def plot_vad(audio: np.ndarray, segments, sample_rate: int, plot) -> None:
    import matplotlib

    if isinstance(plot, str):
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure()
    max_num_samples = 10000
    step = (audio.shape[-1] // max_num_samples) + 1
    times = np.arange(0, audio.shape[-1], step) / sample_rate
    plt.plot(times, audio[::step])
    for s, e in segments:
        plt.axvspan(s / sample_rate, e / sample_rate, color="red", alpha=0.1)
    if isinstance(plot, str):
        plt.savefig(f"{plot}.VAD.jpg", bbox_inches="tight", pad_inches=0)
        plt.close()
    else:  # pragma: no cover - interactive
        plt.show()
