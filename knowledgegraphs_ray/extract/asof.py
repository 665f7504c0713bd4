"""As-of (time-travel) join — keyed, ordered lookup of the latest right-side
row at or before each left-side timestamp.

Ray Data has no native as-of join; the documented composition (Ray guide):
co-locate both sides per key with one groupby, sort within the group, and
run ``pd.merge_asof`` per key. Partitioning assumption: one key's rows fit a
worker (salt hot keys upstream via ``canon.skew`` if not).

The per-group output schema is CONSTANT — columns and dtypes are projected
from the input schemas up front, never inferred from the data of a group
(a data-dependent ``dropna(axis=1)`` here used to make Ray log "RefBundle
with a different schema" warnings and break downstream Arrow ops).
"""

from __future__ import annotations

import pandas as pd
import ray.data


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    key: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    strict: bool = True,
    strategy: str = "scan",
) -> ray.data.Dataset:
    """For every left row: columns of the latest right row of the same key
    with right.ts < left.ts (strict) or <= (not strict). Left rows with no
    match get nulls (left-join semantics).

    strategy="scan" (default): merge-scan — ONE distributed sort of the
    widened union on (key, ts, side) and a vectorized per-block
    last-right-row forward fill with O(num_blocks) boundary carries
    (same construction as ``util.segrank``); no per-key Python at any key
    count, no one-key-per-worker assumption. strategy="group": the
    per-key ``pd.merge_asof`` path, kept as the semantic reference.
    Ties (several right rows at one timestamp) pick an arbitrary equal-ts
    row under "scan" vs right-input order under "group" — identical
    whenever (key, ts) is unique on the right."""

    left_cols = list(left.schema().names)
    rsel_cols = sorted(set([key, ts_col] + (right_cols or [])))
    rsel = right.select_columns(rsel_cols)
    rvalue_cols = [c for c in rsel_cols if c not in (key, ts_col)]
    # right value columns keep their name unless it collides with a left one
    out_name = {c: (c + suffix if c in left_cols else c) for c in rvalue_cols}
    out_name[ts_col] = ts_col + suffix
    out_cols = left_cols + [out_name[c] for c in rvalue_cols] + [ts_col + suffix]

    # dtype templates from the input schemas — constant across groups
    from knowledgegraphs_ray.util.blocks import empty_pandas_template

    l_template = empty_pandas_template(left)
    r_template = empty_pandas_template(rsel)
    out_template = l_template.copy()
    for c in rvalue_cols:
        out_template[out_name[c]] = r_template[c]
    out_template[ts_col + suffix] = r_template[ts_col]

    # widen both sides to one constant column set before the union so every
    # block in the shuffle shares a schema (no RefBundle schema warnings)
    import numpy as np

    union_cols = left_cols + [c for c in rsel_cols if c not in left_cols]

    def _nullable(dtype):
        # placeholder dtype that can hold a null for the absent side; per_key
        # casts each side back to its template dtype (values are non-null).
        # Integers widen to pandas NULLABLE Int64 — NOT float64, which would
        # silently lose precision above 2^53 (snowflake-style ids, ns epochs;
        # ADVICE r2)
        if isinstance(dtype, pd.api.extensions.ExtensionDtype):
            return dtype  # already null-capable
        if np.issubdtype(dtype, np.datetime64):
            return dtype
        if np.issubdtype(dtype, np.integer):
            return pd.Int64Dtype()
        if np.issubdtype(dtype, np.floating):
            return np.dtype("float64")
        return np.dtype("object")

    union_dtype = {
        c: _nullable(
            l_template[c].dtype if c in l_template.columns else r_template[c].dtype
        )
        for c in union_cols
    }

    def _null_value(dtype):
        if isinstance(dtype, pd.api.extensions.ExtensionDtype):
            return pd.NA
        return pd.NaT if np.issubdtype(dtype, np.datetime64) else np.nan

    def widen(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.assign(__side=side)
            for c in union_cols:
                if c not in df.columns:
                    df[c] = pd.Series(
                        _null_value(union_dtype[c]), dtype=union_dtype[c], index=df.index
                    )
            return df[union_cols + ["__side"]].astype(
                {c: union_dtype[c] for c in union_cols}
            )

        return fn

    lmark = left.map_batches(widen(0), batch_format="pandas")
    rmark = rsel.map_batches(widen(1), batch_format="pandas")
    both = lmark.union(rmark)

    if strategy == "scan":
        return _asof_scan(
            both,
            key=key,
            ts_col=ts_col,
            left_cols=left_cols,
            rvalue_cols=rvalue_cols,
            out_name=out_name,
            out_cols=out_cols,
            out_template=out_template,
            nullable=_nullable,
            null_value=_null_value,
            strict=strict,
            suffix=suffix,
        )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["__side"] == 0, left_cols]
        r = g.loc[g["__side"] == 1, rsel_cols]
        if l.empty:
            return out_template.copy()
        l = l.sort_values(ts_col, kind="mergesort")
        # coerce to the template dtypes (the union upcasts disjoint columns)
        l = l.astype({c: out_template[c].dtype for c in left_cols})
        if r.empty:
            out = l.copy()
            for c in rvalue_cols + [ts_col]:
                dt = _nullable(out_template[out_name[c]].dtype)
                out[out_name[c]] = pd.Series(
                    _null_value(dt), dtype=dt, index=out.index
                )
            return out[out_cols]
        r = r.sort_values(ts_col, kind="mergesort")
        rr = r.drop(columns=[key]).rename(
            columns={c: out_name[c] for c in rvalue_cols}
        )
        # right value columns use the null-capable dtype in the OUTPUT too
        # (unmatched left rows hold nulls), so every group agrees on schema
        rr = rr.astype(
            {
                **{
                    out_name[c]: _nullable(out_template[out_name[c]].dtype)
                    for c in rvalue_cols
                },
                ts_col: out_template[ts_col].dtype,
            }
        )
        rr[ts_col + suffix] = rr[ts_col]
        out = pd.merge_asof(
            l,
            rr,
            on=ts_col,
            direction="backward",
            allow_exact_matches=not strict,
        )
        return out[out_cols]

    def per_key_arrow(t) -> pd.DataFrame:
        # pyarrow group format + explicit exact conversion: Ray's default
        # arrow->pandas turns int64-with-nulls into float64 (2^53 loss)
        import pyarrow as _pa

        mapper = {_pa.int64(): pd.Int64Dtype(), _pa.int32(): pd.Int32Dtype()}.get
        return per_key(t.to_pandas(types_mapper=mapper))

    return both.groupby(key).map_groups(per_key_arrow, batch_format="pyarrow")


def _asof_scan(
    both: ray.data.Dataset,
    *,
    key: str,
    ts_col: str,
    left_cols: list[str],
    rvalue_cols: list[str],
    out_name: dict[str, str],
    out_cols: list[str],
    out_template: pd.DataFrame,
    nullable,
    null_value,
    strict: bool,
    suffix: str,
) -> ray.data.Dataset:
    """Merge-scan as-of join over the widened union.

    Sort by (key, ts, side-order) — side-order puts left BEFORE right at
    equal ts when strict (the equal-ts right row must not match) and right
    first otherwise. Each block then computes, fully vectorized, the index
    of the last right row per position with key-run resets (the run-base
    max-accumulate trick) and gathers the right payload; left rows before
    their run's first right row resolve from the driver-threaded carry
    (last right row of the preceding blocks' trailing key)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from knowledgegraphs_ray.util.blocks import compact_nonempty

    payload_src = {out_name[c]: c for c in rvalue_cols}
    payload_src[ts_col + suffix] = ts_col
    out_dtypes = {
        c: (
            out_template[c].dtype
            if c in left_cols
            else nullable(out_template[c].dtype)
        )
        for c in out_cols
    }
    empty_out = pd.DataFrame(
        {c: pd.Series([], dtype=out_dtypes[c]) for c in out_cols}
    )

    def add_order(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        side = df["__side"].to_numpy()
        df["__o"] = side if strict else 1 - side  # strict: left(0) first
        return df

    # bound the scan-task count: sort output blocks track input blocks, and
    # the widened union often carries many small ones
    n_parts = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    ordered = (
        both.repartition(n_parts)
        .map_batches(add_order, batch_format="pandas")
        .sort([key, ts_col, "__o"])
    )
    refs = ordered.to_arrow_refs()

    def _to_pandas_exact(block):
        """Arrow -> pandas keeping int64 columns as nullable Int64: the
        default conversion turns int64-with-nulls into float64 + NaN, losing
        exactness above 2^53 (ADVICE r2)."""
        if isinstance(block, pd.DataFrame):
            return block
        mapper = {pa.int64(): pd.Int64Dtype(), pa.int32(): pd.Int32Dtype()}.get
        return block.to_pandas(types_mapper=mapper)

    @ray.remote(num_returns=2)
    def scan_block(block):
        df = _to_pandas_exact(block)
        n = len(df)
        if n == 0 or key not in df.columns:
            return pa.Table.from_pandas(empty_out, preserve_index=False), {"n": 0}
        k = df[key].to_numpy()
        is_right = (df["__side"].to_numpy() == 1)
        change = np.zeros(n, dtype=bool)
        change[0] = True
        change[1:] = k[1:] != k[:-1]
        run_id = np.cumsum(change) - 1
        base = run_id * (n + 1)
        r = np.where(is_right, np.arange(n), -1)
        acc = np.maximum.accumulate(r + base)
        last_right = acc - base  # -1 where the run has no right row yet

        left_mask = ~is_right
        lr = last_right[left_mask]
        out = pd.DataFrame(index=np.arange(int(left_mask.sum())))
        for c in left_cols:
            out[c] = df.loc[left_mask, c].reset_index(drop=True)
        safe = np.clip(lr, 0, max(n - 1, 0))
        miss = lr < 0
        for oc, src in payload_src.items():
            # pandas take keeps the (possibly nullable-Int64) dtype exact;
            # a numpy round-trip here would degrade int64 to float64
            got = df[src].take(safe).reset_index(drop=True)
            out[oc] = got.mask(miss, null_value(got.dtype))
        # unresolved prefix: left rows of the FIRST run with no right yet
        first_run_left = (run_id[left_mask] == 0) & (lr < 0)
        n_unresolved = int(first_run_left.sum())
        # last-run carry payload
        last_run = run_id == run_id[-1]
        rights_in_last = np.flatnonzero(last_run & is_right)
        if len(rights_in_last):
            j = rights_in_last[-1]
            payload = {oc: df[src].iloc[j] for oc, src in payload_src.items()}
            has_right = True
        else:
            payload, has_right = None, False
        meta = {
            "n": n,
            "first_key": k[0],
            "last_key": k[-1],
            "payload": payload,
            "last_run_has_right": has_right,
            "n_unresolved": n_unresolved,
        }
        out = out[out_cols].astype(out_dtypes)
        return pa.Table.from_pandas(out, preserve_index=False), meta

    @ray.remote
    def fill_prefix(tbl: pa.Table, n_unresolved: int, payload: dict) -> pa.Table:
        df = _to_pandas_exact(tbl)
        for oc, v in payload.items():
            col = df[oc].copy()
            col.iloc[:n_unresolved] = v
            df[oc] = col
        return pa.Table.from_pandas(df, preserve_index=False)

    outs, metas_r = [], []
    for rref in refs:
        o, m = scan_block.remote(rref)
        outs.append(o)
        metas_r.append(m)
    metas = ray.get(metas_r)

    carry_key, carry_payload = None, None
    for i, m in enumerate(metas):
        if m["n"] == 0:
            continue
        if (
            m["first_key"] == carry_key
            and carry_payload is not None
            and m["n_unresolved"] > 0
        ):
            outs[i] = fill_prefix.remote(outs[i], m["n_unresolved"], carry_payload)
        if m["last_run_has_right"]:
            carry_payload = m["payload"]
        elif m["last_key"] != carry_key:
            carry_payload = None
        carry_key = m["last_key"]

    return ray.data.from_arrow_refs(outs)
