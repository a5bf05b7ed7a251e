"""Labelled distance-matrix (.dst) interchange IO.

The reference reads/writes square distance matrices in a tab-separated
format (``Orange/misc/distmatrix.py:113-260`` ``_from_dst``, ``:359-388``
``_save_dst``): a header line ``<n> [axis=<d>] [symmetric|asymmetric]
[row_labels] [col_labels]``, an optional column-label line, then one
row per line (row label first when present), lower triangle only for
symmetric matrices, short lines zero-padded.  Widgets owdistancefile /
owsavedistances are thin wrappers over this format.

The engine computes distances in LONG FORM (``stats/distance.py``:
``(id_a, id_b, dist)`` with ``id_a < id_b``), which scales; .dst is the
small-matrix interchange boundary, so — exactly like ``sources/tab.py``
— both directions run driver-side with loud row bounds, and the
scalable sink for big distance frames stays parquet.

``read_dst`` returns the full logical square as long form
``(i, j[, row_label][, col_label], dist)`` (symmetric input mirrored,
diagonal present), plus ``df.dst_meta = {"n", "axis", "symmetric"}``.
``write_dst`` maps the pair frame's distinct ids to positions in sorted
order, emits ``str(id)`` row labels so ids survive the round-trip, and
writes the lower triangle (missing pairs are 0 — the reference's
padding rule in reverse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_dst(spark: SparkSession, path: str,
             max_cells: int = 4_000_000) -> DataFrame:
    """Parse a .dst file (format of ``distmatrix.py:113-245``) into a
    long-form frame.  Driver-side, bounded by ``max_cells`` = n²."""
    with open(path, encoding="utf-8") as fh:
        header = fh.readline()
        if not header.strip():
            raise ValueError("empty file")
        toks = header.strip().split()
        if not toks[0].isdigit():
            raise ValueError("distance file must begin with dimension")
        n = int(toks.pop(0))
        if n * n > max_cells:
            raise ValueError(
                f".dst reader is driver-side; {n}x{n} > {max_cells} "
                "cells. Store large matrices long-form in parquet.")
        symmetric, axis = True, 1
        row_labels = col_labels = None
        for flag in toks:
            if flag in ("labelled", "labeled", "row_labels"):
                row_labels = []
            elif flag == "col_labels":
                col_labels = []
            elif flag == "symmetric":
                symmetric = True
            elif flag == "asymmetric":
                symmetric = False
            elif flag.startswith("axis=") and flag[5:].isdigit():
                axis = int(flag[5:])
            else:
                raise ValueError(f"invalid flag '{flag}'")
        if col_labels is not None:
            col_labels = [x.strip()
                          for x in fh.readline().strip().split("\t")]
            if len(col_labels) != n:
                raise ValueError("mismatching number of column labels, "
                                 f"{len(col_labels)} != {n}")
        matrix = [[0.0] * n for _ in range(n)]
        for i, line in enumerate(fh):
            if i >= n:
                raise ValueError("too many rows")
            cells = line.strip().split("\t")
            if row_labels is not None:
                row_labels.append(cells.pop(0).strip())
            if len(cells) > n:
                raise ValueError(f"too many columns in matrix row {i + 1}")
            for j, e in enumerate(cells[:i + 1 if symmetric else n]):
                try:
                    matrix[i][j] = float(e)
                except ValueError as exc:
                    raise ValueError("invalid element at row "
                                     f"{i + 1}, column {j + 1}") from exc
                if symmetric:
                    matrix[j][i] = matrix[i][j]

    cols, schema = ["i", "j"], "i int, j int"
    if row_labels is not None:
        cols.append("row_label")
        schema += ", row_label string"
    if col_labels is not None:
        cols.append("col_label")
        schema += ", col_label string"
    schema += ", dist double"
    rows = []
    for i in range(n):
        for j in range(n):
            r: list = [i, j]
            if row_labels is not None:
                r.append(row_labels[i])
            if col_labels is not None:
                r.append(col_labels[j])
            r.append(matrix[i][j])
            rows.append(tuple(r))
    out = spark.createDataFrame(rows, schema)
    out.dst_meta = {"n": n, "axis": axis, "symmetric": symmetric}
    return out


def write_dst(pairs: DataFrame, path: str, *, id_a: str = "id_a",
              id_b: str = "id_b", dist_col: str = "dist", axis: int = 1,
              labels: dict | None = None,
              max_pairs: int = 2_000_000) -> None:
    """Write a symmetric long-form distance frame to .dst
    (``distmatrix.py:359-388`` layout: header + row_labels + lower
    triangle).  Items are the distinct ids of both pair columns in
    sorted order; ``labels`` optionally maps id → label (default
    ``str(id)``).  Pairs may cover any subset — absent cells write 0,
    mirroring the reader's zero-padding.  Driver-side, bounded."""
    from pyspark.sql import functions as F

    sel = pairs.select(F.col(id_a).alias("_a"), F.col(id_b).alias("_b"),
                       F.col(dist_col).cast("double").alias("_d"))
    if sel.limit(max_pairs + 1).count() > max_pairs:
        raise ValueError(f".dst writer is driver-side; > {max_pairs} "
                         "pairs. Use parquet for large matrices.")
    rows = sel.collect()
    ids = sorted({r["_a"] for r in rows} | {r["_b"] for r in rows})
    pos = {v: k for k, v in enumerate(ids)}
    n = len(ids)
    tri = [[0.0] * (i + 1) for i in range(n)]
    for r in rows:
        i, j = pos[r["_a"]], pos[r["_b"]]
        if i < j:
            i, j = j, i
        tri[i][j] = float(r["_d"]) if r["_d"] is not None else 0.0
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(f"{n}\taxis={axis}\trow_labels\n")
        for i, v in enumerate(ids):
            lab = labels[v] if labels is not None else str(v)
            fh.write(str(lab) + "\t"
                     + "\t".join(repr(x) for x in tri[i]) + "\n")
