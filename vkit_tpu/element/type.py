"""Base element types.

Capability parity: vkit/element/type.py:19-42.
"""
from enum import Enum, unique
from typing import Tuple


class Shapable:

    @property
    def height(self) -> int:
        raise NotImplementedError()

    @property
    def width(self) -> int:
        raise NotImplementedError()

    @property
    def area(self) -> int:
        return self.height * self.width

    @property
    def shape(self) -> Tuple[int, int]:
        return self.height, self.width


@unique
class ElementSetOperationMode(Enum):
    # Active if covered by at least one element.
    UNION = 'union'
    # Active if covered by exactly one element.
    DISTINCT = 'distinct'
    # Active if covered by more than one element.
    INTERSECT = 'intersect'
