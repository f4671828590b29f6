"""Ray-free smoke gate over every census class in pipelines.queries.

Each *Census class is a pure map_batches callable (parse kernel only, no
Ray) — instantiate it, feed a 4-row doc_id batch, and require a
well-formed non-empty Arrow table keyed by doc_id. Catches import
breakage, census-page regressions, and column drift for the whole
census surface in one fast test, without spinning Ray up.
"""

import inspect

import pyarrow as pa
import pytest

from htmlreader_ray.pipelines import queries as q

CENSUS_CLASSES = sorted(
    (name, obj) for name, obj in vars(q).items()
    if inspect.isclass(obj) and name.endswith("Census"))

BATCH = pa.table({"doc_id": pa.array([0, 1, 5, 7], pa.int64()),
                  "text": pa.array(["alpha", "beta", "gamma",
                                    "delta"], pa.string())})


@pytest.mark.parametrize("name,cls", CENSUS_CLASSES,
                         ids=[n for n, _ in CENSUS_CLASSES])
def test_census_smoke(name, cls):
    out = cls()(BATCH)
    assert isinstance(out, pa.Table)
    assert out.num_rows >= 4, f"{name} dropped rows"
    assert "doc_id" in out.column_names
    assert out.column("doc_id").to_pylist()[:4] == [0, 1, 5, 7]
    # every column fully populated (censuses never emit nulls)
    for col in out.column_names:
        assert out.column(col).null_count == 0, f"{name}.{col} has nulls"


def test_census_class_count():
    # the census surface only grows; pin a floor so accidental
    # deletions surface here instead of at the driver gate
    assert len(CENSUS_CLASSES) >= 40
