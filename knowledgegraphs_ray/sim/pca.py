"""Distributed PCA over an embedding column — integer-exact covariance
partials, frozen micro-quantized components, map-only projection with a
bit-exact SQL oracle.

The dimensionality-reduction stage a 100-TB embedding pipeline runs before
ANN / clustering (project 64-d -> 8-d, then index). Same two-phase split as
``sim/clusters.py`` / ``text/classifier.py``:

* TRAIN (:func:`train_pca_distributed`): one pass of per-block partials —
  count, sum vector and Gram matrix X^T X — over embeddings quantized PER
  ELEMENT to integers (``floor(x * 2^12)``), so the partial sums are pure
  int64 and their merge (``fastagg.merge_partials`` on (idx, val) rows,
  d + d^2 + 1 keys) is associative and ORDER-INVARIANT: the covariance, and
  hence the eigenvectors, are a pure function of the row set at any
  parallelism. The driver does the d x d eigendecomposition (d is the
  embedding width — trivially driver-sized) and fixes each eigenvector's
  sign so its largest-|.|-coordinate is positive (first index on ties).
  Overflow bound: per-element quantized values |q| <= max|x| * 2^12, so the
  int64 Gram sums hold to ~2^63 / (max|x| * 2^12)^2 rows (~5e9 rows at
  max|x| = 10); beyond that, train on a sample — PCA training on a uniform
  sample is the standard practice, the full corpus only ever runs the
  map-only projection below.

* PROJECT (:func:`project_pca` with the frozen constants): corpus-sized but
  map-only — quantize each embedding with ``floor(x * 2^20)`` (the multiply
  by a power of two is EXACT in float64 and floor has no tie ambiguity, so
  the only float op in the comparison path is exactly reproducible in SQL),
  then one int64 matmul against the frozen micro components and an integer
  mean-offset subtraction. Output ``proj_micro`` is the projection of
  (x - mean) onto each component in units of 2^-20 * 1e-6 — an INTEGER, so
  the DuckDB twin (:func:`oracle_sql`, explicit integer term sums) matches
  hash-for-hash with no float-parity caveat at all. (DuckDB's float kernels
  reassociate: list_inner_product and even parenthesized +-chains diverge
  from any fixed-order fold by ulps above ~12 terms — measured, which is
  why this operator never compares floats.)

Frozen constants below are the output of :func:`train_frozen_pca` on the
sf0.001 embeddings table — provenance pinned in tests/test_pca.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from knowledgegraphs_ray.sim.ann import _batch_matrix

TRAIN_SCALE = 1 << 12  # per-element quantization for the covariance pass
PROJ_SCALE = 1 << 20  # per-element quantization for the projection pass
W_SCALE = 1_000_000  # component micro units


def pca_covariance_partials(
    ds: ray.data.Dataset, *, column: str = "embedding"
) -> tuple[int, np.ndarray, np.ndarray]:
    """-> (n, S, G): exact int64 count, per-dim sums and Gram matrix of the
    PER-ELEMENT-quantized embeddings (floor(x * 2^12)). Only (idx, val)
    partial rows ever move — d^2 + d + 1 per block."""

    def part(batch: pa.Table) -> pd.DataFrame:
        mat = _batch_matrix(batch, column)
        if not len(mat):
            return pd.DataFrame(
                {"idx": pd.Series([], dtype="int64"),
                 "val": pd.Series([], dtype="int64")}
            )
        q = np.floor(mat * TRAIN_SCALE).astype(np.int64)
        d = q.shape[1]
        s = q.sum(axis=0, dtype=np.int64)
        g = (q.T @ q).ravel()
        vals = np.concatenate([[len(q)], s, g])
        return pd.DataFrame(
            {"idx": np.arange(len(vals), dtype=np.int64), "val": vals}
        )

    from knowledgegraphs_ray.util.fastagg import merge_partials

    merged = (
        merge_partials(
            ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
            keys=["idx"],
            agg={"val": "sum"},
        )
        .to_pandas()
        .sort_values("idx")["val"]
        .to_numpy()
    )
    n = int(merged[0])
    d = int(round((np.sqrt(4 * (len(merged) - 1) + 1) - 1) / 2))
    s = merged[1 : 1 + d].astype(np.int64)
    g = merged[1 + d :].astype(np.int64).reshape(d, d)
    return n, s, g


def train_pca_distributed(
    ds: ray.data.Dataset, *, column: str = "embedding", k: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (mean, components, eigenvalues): top-``k`` principal axes of the
    quantized embeddings, identical at any parallelism (integer partials).
    ``components`` rows are unit eigenvectors, eigenvalue-descending, sign
    fixed so each row's largest-|.| coordinate is positive."""
    n, s, g = pca_covariance_partials(ds, column=column)
    if n < 2:
        raise ValueError("PCA needs at least 2 rows")
    mean_q = s / n  # in TRAIN_SCALE units
    cov = (g - np.outer(s, s) / n) / ((n - 1) * TRAIN_SCALE**2)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean_q / TRAIN_SCALE, comps, vals[order]


def train_frozen_pca(sf_dir: str = "/root/testdata/sf0.001", k: int = 8):
    """Provenance: the run that produced the frozen constants below."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    mean, comps, _ = train_pca_distributed(ds, k=k)
    mean_p20 = tuple(int(v) for v in np.round(mean * PROJ_SCALE).astype(np.int64))
    comps_micro = tuple(
        tuple(int(v) for v in row)
        for row in np.round(comps * W_SCALE).astype(np.int64)
    )
    return mean_p20, comps_micro


# Output of train_frozen_pca() — 64-d mean in 2^20 units and 8 x 64
# components in 1e-6 units; provenance pinned in test_pca.py.
PCA_MEAN_P20: tuple[int, ...] = (
    -3195, -1623, 1447, 8823, -2072, -2911, -22, -9696, -11900, -4742, 7963, -9721, -343, 4928, 4835, -3254, 522, -1608, -2218, -5477, -6632, -1955, 3910, -11667, -3236, -3353, -879, -3125, -5417, -3568, -11109, 197, 2042, 4948, -3138, 4373, 886, -548, -9567, 10074, -3909, -8872, 3510, 2828, -6527, -12334, 376, -2400, 2406, 1271, -645, -2225, 3359, 7233, 10322, -87, 3892, 2446, -6967, 2093, -3371, 1443, -4533, 1144,
)
PCA_COMPONENTS_MICRO: tuple[tuple[int, ...], ...] = (
    (-148868, -58027, 43698, -173195, 8847, 235709, 169647, 159015, 64434, -236679, 225769, 47050, 62052, 114802, 222020, 66977, -104613, 16606, -115814, 124279, -49473, 41763, -189374, -38949, 92579, -215671, 45054, 235864, 58754, 35057, 13676, -10107, -37693, 104968, -294633, 18576, -86290, -432, 23446, 28979, 84457, 63763, 113893, 75927, -80911, -221897, -73685, 302358, 87341, -136659, 135324, 71822, -60998, 21488, -23965, -125831, -50073, 103310, -61773, 14132, 29788, 3972, -248302, -90642),
    (-102974, 95673, 262921, -101555, 98955, -224866, -90597, -57994, -216457, -58479, 64182, 66575, 67591, -6136, -102372, 41224, 142499, -25839, 179905, -227411, 290511, 77293, -207188, 260335, -79303, 8992, -6182, -13462, 81228, 92775, 83025, 41234, 160328, 137998, 8893, -233877, -27228, 102813, 27379, -30484, 117258, -262454, 75693, 35225, 73222, -147184, -140621, 28705, 162066, 54205, 57647, 93587, -24995, 33095, 161383, -85242, 115835, 49364, -65402, -92196, -27299, 127969, -77721, 197222),
    (180493, -54649, -112610, 268100, 67693, 74793, -6803, 419644, -26362, -141825, -25380, 117862, 38871, -107655, -76491, -26217, 186653, -112755, -79935, 48079, -161782, 41586, -60295, 90254, 27196, 19367, 40948, 191244, 193916, -132391, 28537, 43123, 78587, -133840, -139830, 6718, 102811, 192383, 28449, 85781, -61542, -34006, -25278, -57538, 118102, 124963, -25559, 195944, -190954, 51998, 6388, -8028, -16522, 120094, 161375, 107672, 158810, -148820, -43028, -204793, 32572, 168484, 97025, 216555),
    (-57479, -72696, 98331, 69439, -52875, 145033, -87132, -28725, 89262, 204696, -13477, 94587, -108166, 27882, -24641, -87282, -53704, 197490, -7815, -27477, -33010, -211059, 53920, 223369, -229974, 56300, 78724, 174847, -31842, 14301, 96054, 213122, 29127, 82902, -90013, 63073, -213404, -142627, 255352, -107698, -111106, 185568, 4354, -121071, -71895, 691, 96055, -61134, -54776, 30701, 114185, 299065, -283912, -14964, 243077, 57520, -14778, 129319, -128014, -11434, 111882, -88351, 113672, 129272),
    (25079, 77138, -195786, -73524, 89573, 127160, 334330, -12155, -98974, -93451, -100950, 14788, -51483, 42575, -146031, 5457, 65419, -164354, -131145, -143451, -26859, 71835, -53554, -136893, -210851, -91967, -89342, -56080, -26518, -79699, 111119, 76404, -142834, 21665, 8448, -272126, -21601, 138807, 216654, 66703, 39205, -255710, -83924, 136900, -185967, 227115, 197384, 26310, 4331, -80942, 18033, 77212, -62872, -20366, 161279, -12297, -62716, 115334, -14763, 316736, -35673, -123699, 102696, 6379),
    (40998, -86603, -122430, 189983, -141614, 63533, 47856, -144389, 73719, -38791, 51108, 21721, 168142, 147170, -20203, 68521, -68186, -36091, 30174, -192984, 139501, -39927, 184974, 21280, -39261, -3916, -252193, 9240, 389199, -177809, 6264, 84754, 53008, -128403, -1559, -176532, -89537, 48561, -104927, 43440, -250377, 253830, -36624, 165165, 101884, -82611, 1151, -166553, 12610, -72645, -25674, -108714, -134287, 463, 852, -161252, 160696, 109904, -44547, 124201, -3275, 150351, -240264, -6162),
    (-236645, -139167, -208083, 28021, 43172, -86338, -140322, 11689, -150009, -28378, 91020, 80589, -45317, -4776, 80634, 75865, 265876, -120527, -136651, 37027, 47597, -96695, -18464, -93209, -102816, 254350, -152378, -96767, -83726, 124920, -119838, 51345, -254030, 160882, 121223, -72469, 134068, 138137, 214920, 26680, 123019, 324596, 142638, -34145, 129319, 84367, -106832, 45834, -32786, -17603, -34334, 114547, -22100, 31714, -137471, 124912, 8039, 50436, -259275, -10507, -29317, 49460, -157502, -46894),
    (-40404, -160447, -86673, -61031, 179888, -25800, 8336, -24119, 221511, 135846, -68158, 48491, 170327, 431075, 80574, -5167, -53168, 10329, 28521, -135416, -26496, -258871, -131863, -59009, -91101, 54891, -97071, -19465, -49800, -106366, -62101, 188084, 48855, 110295, -61301, 159118, 94509, -77847, -26098, 124518, -32061, -232569, 104960, -17978, 98196, -110774, 240438, 80846, -29823, 98397, -175548, 57967, 227551, 137341, 27191, 15294, -23777, -186737, -64696, 8158, -224203, 53941, -38356, 93825),
)


def _frozen() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    if not PCA_MEAN_P20 or not PCA_COMPONENTS_MICRO:
        raise RuntimeError("frozen PCA constants missing — run train_frozen_pca")
    mean = np.asarray(PCA_MEAN_P20, dtype=np.int64)
    w = np.asarray(PCA_COMPONENTS_MICRO, dtype=np.int64)
    offs = w @ mean  # per-component integer centering constants
    return mean, w, offs


def project_pca(
    ds: ray.data.Dataset,
    *,
    id_column: str = "vec_id",
    column: str = "embedding",
) -> ray.data.Dataset:
    """Map-only projection onto the frozen components ->
    (vec_id, component, proj_micro) long form, ``proj_micro`` =
    (x - mean) . w in integer 2^-20 * 1e-6 units — EXACT int64 arithmetic."""
    _, w, offs = _frozen()
    k = len(w)

    def kern(batch: pa.Table) -> pd.DataFrame:
        mat = _batch_matrix(batch, column)
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        if not len(mat):
            return pd.DataFrame(
                {"vec_id": pd.Series([], dtype="int64"),
                 "component": pd.Series([], dtype="int64"),
                 "proj_micro": pd.Series([], dtype="int64")}
            )
        q = np.floor(mat * PROJ_SCALE).astype(np.int64)
        proj = q @ w.T - offs  # (n, k) int64
        return pd.DataFrame(
            {
                "vec_id": np.repeat(ids.astype(np.int64), k),
                "component": np.tile(np.arange(k, dtype=np.int64), len(ids)),
                "proj_micro": proj.ravel(),
            }
        )

    return ds.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True)


def oracle_sql(table: str = "embeddings") -> str:
    """DuckDB twin: per component one explicit integer term sum —
    floor(CAST(e[j] AS DOUBLE) * 2^20)::BIGINT * w_j, minus the same
    integer centering constant. Integer addition is associative, so
    DuckDB's evaluation order cannot matter."""
    _, w, offs = _frozen()
    selects = []
    for ki, row in enumerate(w):
        terms = " + ".join(
            f"CAST(floor(CAST(embedding[{j + 1}] AS DOUBLE) * {PROJ_SCALE}) AS BIGINT) * ({int(wj)})"
            for j, wj in enumerate(row)
        )
        selects.append(
            f"SELECT vec_id, {ki} AS component, "
            f"({terms}) - ({int(offs[ki])}) AS proj_micro FROM {table}"
        )
    return " UNION ALL ".join(selects)
