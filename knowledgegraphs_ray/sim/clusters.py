"""Embedding cluster assignment — distributed k-means centroids frozen as
integer micro units, map-only assignment, exact SQL oracle.

The clustering twin of the classifier pattern (text/classifier.py): the
EXPENSIVE, corpus-sized pass is assignment (one matmul per batch against a
broadcast centroid matrix — map-only, shuffle-free); training ran once via
``sim.ivf.train_centroids_distributed`` on the sf0.001 embeddings table
(per-block partial sums, bounded driver merge) and the result is stored
quantized to 1e-6 so any retrain at any parallelism reproduces it
bit-for-bit (tests/test_clusters.py). The DuckDB oracle scores the SAME
micro/1e6 centroid literals with list_inner_product and mirrors numpy's
first-max tie (ORDER BY score DESC, cluster ASC).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from knowledgegraphs_ray.sim.ann import _batch_matrix, _normalize

# 8 x 64 centroid matrix in integer micro units (centroid = row / 1e6):
# output of train_frozen_centroids() below — provenance pinned in tests.
CENTROIDS_MICRO = (
    (-28332, 26968, 175013, 297043, 38173, -197584, -93503, -155785, 95102, -75824, -100798, -103575, -140579, -89890, 120672, -150945, 47308, 82384, -51306, -215108, 94629, -169067, -46960, 82128, -220387, 42347, -164832, -27315, 55108, -233122, -64188, 24944, 144674, -230711, 100818, -182350, 16435, -80821, -91127, -129026, -85073, -154119, 74543, -134039, -28708, 181359, 70652, -145112, 154529, 214390, -116790, -17883, 25080, 192554, 106378, -1678, 20602, -124428, -28660, 22855, -69260, -133570, 106710, 112680),
    (-135078, 136356, 174179, -46780, 68205, 25001, 158937, -89653, -394897, 23395, 210924, 114909, -5678, 43886, 83553, -1127, 79019, -163648, -9413, 70331, 137694, 77430, -12331, -23829, -8973, 81759, -158961, -72201, -93410, -80305, -11829, -42496, -79872, 170769, 112581, -290171, -112563, 252132, 100386, 43801, 133686, -74855, 60744, 120891, 82915, -194275, 116361, 44561, 21003, -74961, 16224, -7415, -62028, 36483, 167158, -197387, 17948, 201039, -187510, 47995, -19372, 13810, -266512, 841),
    (-290450, -140075, -102277, 11542, 11714, -152411, 94884, -39603, 58651, 42163, -22286, -153620, 137335, 276593, -93263, 45771, -32363, -25092, 62011, -70240, 56030, 194537, -69494, -140285, -27878, 74060, -232432, 42223, 102729, -50001, -283954, 21929, -14441, -13751, -145160, 318182, 191355, -46977, -155601, 69828, -80494, -199494, -43912, 82609, 41276, -276772, 101424, 127469, 42674, 73427, -46572, -24986, 46171, -12889, -9203, -121664, 56938, -138937, -134645, 2151, -115052, 112684, -174000, 96237),
    (-168501, -67525, -128710, -43570, -325445, 95204, 24263, 17765, -38989, -92088, 71468, -99854, -264846, -13695, 213923, -35611, 124855, 35440, -22641, -61228, -117810, -28815, 28075, -241892, 22558, -95304, -1082, -135796, -233296, 53872, -21347, 150674, 6189, 72986, 40186, 133169, -10268, -150185, 47087, 101471, -27579, 297205, 109030, 85615, -246408, -1349, 101712, 130149, -40687, -48457, -21233, 97409, -8277, 49927, 66570, 219007, -131899, 152071, 146043, 57652, 38255, -134993, 30175, -275228),
    (353536, 24548, -124629, 194020, 42367, 351053, 256576, 31533, -92731, -90865, 16954, -23107, 153800, 26148, -232244, -22114, -113164, -91228, 1915, 75353, -237943, -184691, 163523, -26306, -68281, -120831, 120684, -18489, 30990, -190900, -65122, -1803, 104593, -12889, -101066, 14165, -77176, -51018, -13424, 194150, -110376, -123285, -78923, 17426, 10706, 202413, 118362, -126308, -73504, -49716, 104874, -89610, -41631, -16601, 151656, -13027, -7413, -40512, -35054, 157228, 101364, -9617, 206898, 79550),
    (-47213, 58448, 80114, -28473, 140756, 39249, -212340, 158617, -1317, -6740, 35795, 8128, -222812, -78882, 174858, -65298, -164489, 45210, -87077, 53457, -365494, -62770, -50332, 70270, 36253, 131824, 232753, 43218, -223129, 135198, 144368, -109806, -204333, 42127, -85721, 178204, -81641, -73303, -37289, -50882, 86883, 12733, 136066, -192199, 104189, 46381, -110197, 122187, -29465, -154, 97693, 51331, 151441, 127619, -101765, 84692, -69474, -141212, -281593, -98962, -209196, 95790, 18849, -65940),
    (-48357, -223733, 85942, -76142, -74522, 11777, -218349, 22572, 35349, -59161, 10303, 72750, 219004, -139627, 6835, -103038, 28531, 33638, -136863, 154751, -18691, -34097, 62495, 94125, 84123, -81945, 101510, 191977, 237273, 90543, -151073, -97503, 51131, 145431, -89669, -52438, 16765, 52266, 53092, -47829, 98664, 110525, -42953, 129850, -138366, -150251, -291558, 64061, 98411, -121947, -44556, -169487, -261433, -79169, -77465, -79443, 155068, 233391, 126139, -237835, 212669, 109043, -27296, 101888),
    (304842, 139572, -57587, -18727, 52308, -284728, -81756, -233763, 38163, 110945, -17429, -76370, 102772, 48545, -100946, 203814, 58573, 72094, 153281, -172613, 280482, 103555, 39881, -85879, 73495, -128047, 100438, -88235, 4788, 166484, 159227, 47760, 81575, -60254, 106781, -63044, 72540, 83050, -166959, 56882, -114762, -109568, -100175, -57740, -24210, -104249, -142802, -318555, -66486, 67704, -25627, 84103, 227316, -65207, -13557, 118430, 90379, -60322, 228137, 77538, -12584, -27250, 18844, 11207),
)


def centroids() -> np.ndarray:
    return np.asarray(CENTROIDS_MICRO, dtype=np.int64) / 1_000_000.0


def assign_clusters(
    ds: ray.data.Dataset,
    *,
    id_column: str = "vec_id",
    column: str = "embedding",
) -> ray.data.Dataset:
    """-> (vec_id, cluster_id): argmax cosine against the frozen centroids
    (vectors are NOT normalized — a positive per-row scale never changes the
    argmax, and skipping it keeps the kernel the exact twin of the SQL
    inner-product ordering)."""
    cent = centroids()

    def kern(batch: pa.Table) -> pd.DataFrame:
        mat = _batch_matrix(batch, column)
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        if not len(mat):
            return pd.DataFrame(
                {"vec_id": pd.Series([], dtype="int64"),
                  "cluster_id": pd.Series([], dtype="int64")}
            )
        scores = mat @ cent.T  # (n, n_list)
        best = scores.argmax(axis=1)  # first max == min index on ties
        return pd.DataFrame(
            {"vec_id": ids.astype("int64"),
              "cluster_id": best.astype("int64")}
        )

    return ds.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True)


def train_frozen_centroids(sf_dir: str = "/root/testdata/sf0.001"):
    """Provenance: the run that produced CENTROIDS_MICRO."""
    from knowledgegraphs_ray.sim.ivf import train_centroids_distributed

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    c = train_centroids_distributed(ds, n_list=8, n_iter=5)
    return tuple(
        tuple(int(v) for v in row)
        for row in np.round(c * 1_000_000.0).astype(np.int64)
    )


def oracle_sql(table: str = "embeddings") -> str:
    """DuckDB twin: cross join against the centroid VALUES table, first-max
    tie via (score DESC, cluster ASC)."""
    vals = ", ".join(
        "(" + str(i) + ", ["
        + ", ".join(f"{v} / 1000000.0" for v in row)
        + "])"
        for i, row in enumerate(CENTROIDS_MICRO)
    )
    return (
        "SELECT vec_id, CAST(c AS BIGINT) AS cluster_id FROM ("
        "SELECT e.vec_id, cent.c, row_number() OVER ("
        "PARTITION BY e.vec_id ORDER BY list_inner_product(e.emb, cent.v) DESC, cent.c ASC"
        ") AS rn FROM "
        f"(SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM {table}) e "
        f"CROSS JOIN (SELECT * FROM (VALUES {vals}) AS t(c, v)) cent"
        ") WHERE rn = 1"
    )


def cluster_balanced_sample(
    ds: ray.data.Dataset,
    *,
    id_column: str = "vec_id",
    column: str = "embedding",
    k_per_cluster: int = 10,
) -> ray.data.Dataset:
    """Cluster-balanced coreset selection — the embedding-space counterpart
    of per-source quotas: assign every vector to its frozen centroid, then
    keep the top ``k_per_cluster`` per cluster by an INTEGER energy score
    (sum of floor(x * 2^20)^2 — the quantized squared norm; in production
    swap in any integer-quantized quality score). Bounds the output to
    n_clusters x k while preserving coverage of every region of the space.

    Shape: one fused map-only kernel (assignment matmul + energy) ->
    ``topk_per_group`` (per-batch prune, slim survivor sort) — the corpus
    never shuffles. Ties break on id ascending; selection is a pure
    function of the data at any parallelism. Energy overflow bound:
    d * (max|x| * 2^20)^2 < 2^63 -> max|x| < ~830 at d = 64."""
    from knowledgegraphs_ray.util.topk import topk_per_group

    cent = centroids()

    def kern(batch: pa.Table) -> pd.DataFrame:
        mat = _batch_matrix(batch, column)
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        if not len(mat):
            return pd.DataFrame(
                {"vec_id": pd.Series([], dtype="int64"),
                 "cluster_id": pd.Series([], dtype="int64"),
                 "energy": pd.Series([], dtype="int64")}
            )
        best = (mat @ cent.T).argmax(axis=1)
        q = np.floor(mat * float(1 << 20)).astype(np.int64)
        energy = (q * q).sum(axis=1)
        return pd.DataFrame(
            {"vec_id": ids.astype("int64"),
             "cluster_id": best.astype("int64"),
             "energy": energy}
        )

    scored = ds.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True)
    return topk_per_group(
        scored,
        key_cols=["cluster_id"],
        score_col="energy",
        id_col="vec_id",
        k=k_per_cluster,
    )


def cluster_balanced_sample_oracle_sql(
    *, table: str = "embeddings", k_per_cluster: int = 10
) -> str:
    """DuckDB twin: frozen-centroid assignment (same VALUES table as
    ``oracle_sql``) + integer energy terms + window rank."""
    energy_terms = " + ".join(
        f"(CAST(floor(CAST(embedding[{j + 1}] AS DOUBLE) * {1 << 20}) AS BIGINT) * "
        f"CAST(floor(CAST(embedding[{j + 1}] AS DOUBLE) * {1 << 20}) AS BIGINT))"
        for j in range(64)
    )
    return (
        f"WITH assign AS ({oracle_sql(table)}), "
        f"score AS (SELECT vec_id, ({energy_terms}) AS energy FROM {table}), "
        "ranked AS (SELECT a.vec_id, a.cluster_id, s.energy, "
        "row_number() OVER (PARTITION BY a.cluster_id "
        "ORDER BY s.energy DESC, a.vec_id) - 1 AS rank "
        "FROM assign a JOIN score s ON s.vec_id = a.vec_id) "
        f"SELECT vec_id, cluster_id, energy, CAST(rank AS BIGINT) AS rank "
        f"FROM ranked WHERE rank < {int(k_per_cluster)}"
    )
