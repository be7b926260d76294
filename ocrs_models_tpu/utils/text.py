"""Text codec and decode utilities.

Semantics match the reference (datasets/util.py:113-177): class index 0 is
the CTC blank, characters map to ``alphabet.index(ch) + 1``, unknown
characters substitute ``unknown_char``. On top of the host-side string
codec, this module adds a vectorized on-device batched greedy CTC decode
(the reference decodes sample-by-sample in Python on the host,
train_rec.py:52-65 — a device→host sync per batch the TPU build avoids).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=8)
def _char_to_index(alphabet: str) -> dict[str, int]:
    return {ch: i + 1 for i, ch in enumerate(alphabet)}


def encode_text(text: str, alphabet: str, unknown_char: str = "?") -> np.ndarray:
    """Encode ``text`` as a ``[len(text)]`` int32 array of class indices."""
    table = _char_to_index(alphabet)
    unknown = table[unknown_char]
    return np.array([table.get(ch, unknown) for ch in text], dtype=np.int32)


def decode_text(indices, alphabet: str) -> str:
    """Decode class indices to a string, skipping blanks (class 0)."""
    indices = np.asarray(indices).tolist()
    return "".join(alphabet[i - 1] for i in indices if i > 0)


def ctc_greedy_decode_text(indices, alphabet: str) -> str:
    """Greedy CTC decode: collapse adjacent repeats, then drop blanks."""
    indices = np.asarray(indices).tolist()
    chars = []
    last = None
    for cls in indices:
        if cls == last:
            continue
        last = cls
        if cls == 0:
            continue
        chars.append(alphabet[cls - 1])
    return "".join(chars)


def ctc_greedy_decode_batch(
    class_ids: jnp.ndarray, lengths: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized batched greedy CTC decode on device.

    :param class_ids: ``[N, T]`` int array of per-timestep argmax class ids.
    :param lengths: ``[N]`` valid lengths of each sequence.
    :return: ``(decoded, decoded_lengths)`` where ``decoded`` is ``[N, T]``
        with the surviving class ids left-packed and zero-padded, and
        ``decoded_lengths`` is ``[N]``.

    Equivalent to applying :func:`ctc_greedy_decode_text`'s collapse+deblank
    per row, but with static shapes (repeats collapse via a shifted
    comparison; the keep-mask compacts with a cumulative-sum scatter).
    """
    n, t = class_ids.shape
    pos = jnp.arange(t)[None, :]
    valid = pos < lengths[:, None]

    prev = jnp.concatenate(
        [jnp.full((n, 1), -1, class_ids.dtype), class_ids[:, :-1]], axis=1
    )
    keep = (class_ids != prev) & (class_ids != 0) & valid

    # Left-pack kept entries: destination index = exclusive cumsum of keep.
    dest = jnp.cumsum(keep, axis=1) - 1
    dest = jnp.where(keep, dest, t)  # parked row => scatter-drop slot
    decoded = jnp.zeros((n, t + 1), class_ids.dtype)
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, t))
    decoded = decoded.at[rows, dest].set(jnp.where(keep, class_ids, 0))
    return decoded[:, :t], jnp.sum(keep, axis=1)


def ctc_beam_search_decode(
    log_probs: np.ndarray, alphabet: str, beam_width: int = 10
) -> str:
    """CTC prefix beam search over per-timestep log-probabilities.

    The reference's docstring names beam search as a decode option
    (models.py:155-160) but only greedy exists anywhere in its code; this
    provides the real thing. Host-side (decode is not a throughput path).

    :param log_probs: ``[T, C]`` log-probabilities, class 0 = blank.
    :param beam_width: number of prefixes kept per step.
    :return: the most probable label string.
    """
    log_probs = np.asarray(log_probs)
    t_len, n_classes = log_probs.shape
    NEG = -1e30

    def logsum(a, b):
        if a <= NEG:
            return b
        if b <= NEG:
            return a
        m = max(a, b)
        return m + np.log(np.exp(a - m) + np.exp(b - m))

    # beams: prefix tuple -> (log p ending in blank, log p ending in non-blank)
    beams: dict[tuple, tuple[float, float]] = {(): (0.0, NEG)}
    for t in range(t_len):
        lp = log_probs[t]
        # Consider blank + the top classes by emission prob for efficiency.
        top = np.argpartition(-lp, min(beam_width, n_classes - 1))[: beam_width + 1]
        candidates = set(int(c) for c in top) | {0}
        new_beams: dict[tuple, tuple[float, float]] = {}

        def add(prefix, pb, pnb):
            opb, opnb = new_beams.get(prefix, (NEG, NEG))
            new_beams[prefix] = (logsum(opb, pb), logsum(opnb, pnb))

        for prefix, (pb, pnb) in beams.items():
            total = logsum(pb, pnb)
            for c in candidates:
                p = float(lp[c])
                if c == 0:
                    add(prefix, total + p, NEG)
                    continue
                last = prefix[-1] if prefix else None
                if c == last:
                    # Repeat: extends the blank-ended path only; the
                    # non-blank-ended path collapses into the same prefix.
                    add(prefix + (c,), NEG, pb + p)
                    add(prefix, NEG, pnb + p)
                else:
                    add(prefix + (c,), NEG, total + p)
        beams = dict(
            sorted(
                new_beams.items(),
                key=lambda kv: logsum(*kv[1]),
                reverse=True,
            )[:beam_width]
        )
    best = max(beams.items(), key=lambda kv: logsum(*kv[1]))[0]
    return "".join(alphabet[c - 1] for c in best)


def levenshtein(a: str, b: str) -> int:
    """Edit distance between two strings (first-party replacement for the
    reference's ``pylev`` dependency, train_rec.py:5,65). Uses the native
    C++ core when available, numpy DP otherwise."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    from ..geometry import native

    if native.available():
        return native.levenshtein(a, b)
    # Vectorized DP over rows of the edit matrix.
    bn = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(len(bn) + 1, dtype=np.int64)
    for i, ch in enumerate(a):
        cur = np.empty_like(prev)
        cur[0] = i + 1
        sub = prev[:-1] + (bn != ord(ch))
        # cur[j+1] = min(prev[j+1] + 1, sub[j], cur[j] + 1); the cur[j]+1 term
        # is a running minimum, resolved with a prefix-min trick.
        np.minimum(prev[1:] + 1, sub, out=cur[1:])
        # Resolve left-to-right dependency: cur[j+1] = min(cur[j+1], cur[j]+1)
        # equals min over k<=j+1 of cur[k] + (j+1-k).
        m = np.minimum.accumulate(cur - np.arange(len(cur)))
        cur = np.minimum(cur, m + np.arange(len(cur)))
        prev = cur
    return int(prev[-1])
