"""Generate the 256x256 blue-noise ordered-dither table.

Role of the reference's precomputed dither-matrix256.cpp (a 9391-line
generated C++ table): we generate the equivalent rank matrix once with a
void-and-cluster style greedy energy fill (Ulichney 1993's phase-2 "fill
voids" rule applied from an empty pattern) and ship it as a 128 KB .npy
that utils/bitmap.py loads at runtime, falling back to Bayer when absent.

    python benchmarks/gen_bluenoise.py    # writes mitsuba2_tpu/data/bluenoise256.npy

Each of the 65536 ranks appears exactly once (same ordered-dither
contract as the Bayer fallback); spectral quality is blue (energy
concentrated at high frequencies) because every point is placed at the
current minimum of a toroidally-wrapped Gaussian energy field.
"""
import os
import numpy as np

N = 256
SIGMA = 1.9


def wrapped_gaussian(n: int, sigma: float) -> np.ndarray:
    ax = np.arange(n, dtype=np.float64)
    d = np.minimum(ax, n - ax)          # toroidal distance per axis
    d2 = d[:, None] ** 2 + d[None, :] ** 2
    return np.exp(-d2 / (2.0 * sigma * sigma))


def main():
    rng = np.random.default_rng(0xB10E)
    kern = wrapped_gaussian(N, SIGMA)
    energy = rng.random((N, N)) * 1e-9   # deterministic tie-breaker
    rank = np.zeros((N, N), np.uint16)
    occupied = np.zeros((N, N), bool)
    for r in range(N * N):
        flat = np.where(occupied.ravel(), np.inf, energy.ravel())
        idx = int(np.argmin(flat))
        y, x = divmod(idx, N)
        rank[y, x] = r
        occupied[y, x] = True
        energy += np.roll(np.roll(kern, y, axis=0), x, axis=1)
        if r % 8192 == 0:
            print(f"{r}/{N*N}")
    out = os.path.join(os.path.dirname(__file__), "..",
                       "mitsuba2_tpu", "data", "bluenoise256.npy")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.save(out, rank)
    # sanity: every rank exactly once
    assert np.array_equal(np.sort(rank.ravel()), np.arange(N * N))
    print("wrote", out)


if __name__ == "__main__":
    main()
