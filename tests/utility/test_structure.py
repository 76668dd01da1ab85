from enum import Enum
from typing import Mapping, Optional, Sequence, Tuple

import attr
import pytest

from vkit_tpu.utility import dyn_structure


class Mode(Enum):
    A = 'a'
    B = 'b'


@attr.define
class Inner:
    x: int
    y: float = 2.0


@attr.define
class Outer:
    name: str
    inner: Inner
    pair: Tuple[int, int] = (1, 2)
    seq: Sequence[Inner] = ()
    mode: Mode = Mode.A
    opt: Optional[int] = None
    table: Mapping[str, float] = attr.field(factory=dict)


def test_nested_structure():
    out = dyn_structure(
        {
            'name': 'n',
            'inner': {'x': 3},
            'pair': [4, 5],
            'seq': [{'x': 1}, {'x': 2, 'y': 9.0}],
            'mode': 'b',
            'opt': 7,
            'table': {'k': 1},
        },
        Outer,
    )
    assert out.inner == Inner(x=3, y=2.0)
    assert out.pair == (4, 5)
    assert out.seq[1].y == 9.0
    assert out.mode is Mode.B
    assert out.opt == 7
    assert out.table == {'k': 1.0}


def test_forbid_extra_keys():
    with pytest.raises(TypeError):
        dyn_structure({'name': 'n', 'inner': {'x': 1}, 'bogus': 1}, Outer)


def test_instance_passthrough():
    obj = Outer(name='n', inner=Inner(x=1))
    assert dyn_structure(obj, Outer) is obj


def test_json_path(tmp_path):
    path = tmp_path / 'cfg.json'
    path.write_text('{"name": "n", "inner": {"x": 1}}')
    out = dyn_structure(str(path), Outer, support_path_type=True)
    assert out.name == 'n'
