"""Fourth review pass: the planted-transform preps must work on
large_string corpora — binary_join_element_wise has no mixed
(large_string, string, string) kernel, so suffix AND separator types
must follow the text column type."""

import pyarrow as pa

from json_remedy_ray.functions.queries import (
    _FOOTER_DUP,
    _SHARED_BOILERPLATE,
    _crossdoc_plant,
    _intradoc_prep,
)


def _batch(t):
    return pa.table({"doc_id": pa.array([0, 4], type=pa.int64()),
                     "text": pa.array(["a b", None], type=t)})


def test_intradoc_prep_both_string_types():
    for t in (pa.string(), pa.large_string()):
        out = _intradoc_prep(_batch(t))
        assert out["text"].to_pylist() == ["a b" + _FOOTER_DUP, _FOOTER_DUP]
        assert out["text"].type.equals(t)


def test_crossdoc_plant_both_string_types():
    for t in (pa.string(), pa.large_string()):
        out = _crossdoc_plant(_batch(t))
        # doc 0 and doc 4 are both %4==0 -> planted
        assert out["text"].to_pylist() == ["a b" + _SHARED_BOILERPLATE,
                                           _SHARED_BOILERPLATE]
        assert out["text"].type.equals(t)
