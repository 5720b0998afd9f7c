"""Minimal pyDOE shim (only `lhs`, the single symbol the reference imports)
so the reference library at /root/reference can be imported for baseline
timing runs without installing its dependencies."""
import numpy as np


def lhs(n, samples=None, criterion=None, iterations=5):
    samples = n if samples is None else samples
    best, best_score = None, -np.inf
    tries = iterations if criterion in ("maximin", "m") else 1
    for _ in range(max(1, tries)):
        H = np.empty((samples, n))
        for j in range(n):
            perm = np.random.permutation(samples)
            H[:, j] = (perm + np.random.rand(samples)) / samples
        if tries == 1:
            return H
        d2 = ((H[:, None, :] - H[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        score = d2.min()
        if score > best_score:
            best, best_score = H, score
    return best
