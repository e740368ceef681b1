#!/usr/bin/env python3
"""Cross-validate graft.sources.Sas7bdat's WRITER against pandas' READER.

pandas.io.sas is an independent implementation of the public sas7bdat
spec, so if a file produced by our Scala writer decodes identically to
the reference parquet mirror under pd.read_sas, the writer emits real
sas7bdat — and by the round-trip test in Sas7bdatSpec, our reader parses
it too. (Driver-side tooling only: pandas is not a dependency of the
library.)

Generate the fixture first (any size; pass the full mirror for the real
gate):

  sbt console
  > val m = graft.TestSpark.spark.read.parquet("/root/reference/sas_data")
  > graft.sources.Sas7bdat.writeDataFrame(m, "/tmp/i94.sas7bdat", datasetName = "I94_APR16")

Then:  python3 tools/check_sas7bdat_pandas.py /tmp/i94.sas7bdat /root/reference/sas_data
"""
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq


def summarize(df: pd.DataFrame) -> dict:
    out = {"rows": len(df)}
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            out[c] = ("num", int(s.isna().sum()), float(np.nansum(s.to_numpy())))
        else:
            vals = s.fillna("")  # pandas uses NaN for blank/missing char
            out[c] = ("str", int((vals == "").sum()),
                      int(pd.util.hash_pandas_object(vals, index=False).sum() % (2**61)))
    return out


def main(sas_path: str, parquet_dir: str) -> int:
    sas = pd.read_sas(sas_path, format="sas7bdat", encoding="ISO-8859-1")
    mirror = pq.read_table(parquet_dir).to_pandas()
    # our writer lays numerics out first; compare on the mirror's order
    sas = sas[list(mirror.columns)]
    a, b = summarize(sas), summarize(mirror)
    bad = [k for k in b if a.get(k) != b[k]]
    for k in bad:
        print(f"MISMATCH {k}: pd.read_sas={a.get(k)} mirror={b[k]}")
    print(f"rows={a['rows']} columns={len(mirror.columns)} mismatches={len(bad)}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
