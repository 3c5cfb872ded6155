"""Invariants behind the pq_planted exact oracle (pure numpy, no Ray):
the Hadamard construction must make the PQ/ADC scan bit-exact."""

import numpy as np

from planetiler_ray.pipelines.training import _hadamard8
from planetiler_ray.stages.ann import _normalize, _pq_codes


def _vec(v: int, H: np.ndarray) -> np.ndarray:
    js = [(v >> (3 * s)) & 7 for s in range(8)]
    return np.concatenate([H[j] for j in js]).astype(np.float64)


def _query(m: int, H: np.ndarray) -> np.ndarray:
    return np.concatenate([
        H @ np.array([((j + m) % 8) * 9 ** s for j in range(8)],
                     dtype=np.float64) / 8.0
        for s in range(8)
    ])


def test_hadamard_orthogonal():
    H = _hadamard8()
    assert np.array_equal(H @ H.T, 8 * np.eye(8))


def test_codes_recover_digits_exactly():
    H = _hadamard8()
    books = np.repeat(H[None] / 8.0, 8, axis=0)
    ids = np.arange(1, 300, dtype=np.int64)
    mat = np.stack([_vec(int(v), H) for v in ids])
    assert np.allclose(np.linalg.norm(mat, axis=1), 8.0)
    codes = _pq_codes(_normalize(mat), books)
    expect = np.stack(
        [(ids >> (3 * s)) & 7 for s in range(8)], axis=1).astype(np.uint8)
    assert np.array_equal(codes, expect)


def test_adc_similarity_is_exact_base9_integer():
    H = _hadamard8()
    ids = np.arange(1, 200, dtype=np.int64)
    mat = np.stack([_vec(int(v), H) for v in ids])
    for m in range(4):
        q = _query(m, H)
        dots = mat @ q
        sim_int = np.array([
            sum((((int(v) >> (3 * s)) & 7) + m) % 8 * 9 ** s
                for s in range(8)) for v in ids], dtype=np.float64)
        assert np.array_equal(dots, sim_int)
        # distinct for distinct vec_ids below 8^8 => no rank ties ever
        assert len(np.unique(sim_int)) == len(ids)
