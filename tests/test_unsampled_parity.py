"""Exhaustive (UNSAMPLED) parity for the three hash-sampled gates
(r10 commit a9ec6ac sampled st_triangulate_ops / st_subdivide_ops
1-in-10 and st_concave_hull 1-in-50 for bench cost; VERDICT r10 item 3
asks for an unsampled proof to exist SOMEWHERE). At sf0.001 the
unsampled run costs seconds, so the full fixture is re-proved against
the same DuckDB oracle with the sampling WHERE stripped."""

from __future__ import annotations

import math

import pytest

from geospatial_data_pipeline_spark_sedona_on_aws_spark.multimodal import binary as MM
from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans import pipeline as P

from tests.conftest import SF_SMOKE

CASES = [
    ("st_triangulate_ops", P.st_triangulate_ops,
     "WHERE property_id % 10 = 3"),
    ("st_subdivide_ops", P.st_subdivide_ops,
     "WHERE property_id % 10 = 3"),
    ("st_concave_hull", P.st_concave_hull,
     "WHERE property_id % 50 = 3"),
    # r12: the LSF scalefactor query samples docs (residue 2); prove the
    # whole fixture once, unsampled
    ("multimodal_mp3_lsf_scalefactors", MM.multimodal_mp3_lsf_scalefactors,
     "WHERE doc_id % 3 = 2"),
    # r13: the spectral-line queries sample docs (residue 0); prove the
    # whole fixture once, unsampled
    ("multimodal_mp3_spectrum", MM.multimodal_mp3_spectrum,
     "WHERE doc_id % 3 = 0"),
    ("multimodal_mp3_band_energy", MM.multimodal_mp3_band_energy,
     "WHERE doc_id % 3 = 0"),
]


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if a is None or b is None:
            return a is None and b is None
    except Exception:
        pass
    return a == b


@pytest.mark.parametrize("name,fn,where", CASES,
                         ids=[c[0] for c in CASES])
def test_unsampled_gate_matches_oracle(spark, duck, name, fn, where):
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans import registry

    oracle_sql = registry.ORACLES[name]
    assert where in oracle_sql, "sampling predicate moved — update test"
    full_sql = oracle_sql.replace(where, "")
    sdf = fn(spark, SF_SMOKE, _sampled=False).toPandas()
    odf = duck.execute(full_sql).df()
    assert len(sdf) == len(odf) and len(sdf) > 0
    assert sorted(sdf.columns) == sorted(odf.columns)
    cols = sorted(sdf.columns)
    s_rows = sorted(map(tuple, sdf[cols].itertuples(index=False)))
    o_rows = sorted(map(tuple, odf[cols].itertuples(index=False)))
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        for c, sv, ov in zip(cols, sr, orow):
            assert _values_equal(sv, ov), (name, i, c, sv, ov)
