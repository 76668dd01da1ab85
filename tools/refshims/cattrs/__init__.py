"""Minimal cattrs stand-in over vkit_tpu.utility.structure."""
from typing import Any, Dict

import attr as _attr

from . import errors, gen  # noqa: F401


def override(omit=False, rename=None):
    return {'omit': omit, 'rename': rename}


class Converter:

    def __init__(self):
        self._structure_hooks: Dict[Any, Any] = {}
        self._unstructure_hook_factories = []

    # -- structure --------------------------------------------------------

    def register_structure_hook(self, cls, hook):
        self._structure_hooks[cls] = hook

    def structure(self, obj, cls):
        if cls in self._structure_hooks:
            return self._structure_hooks[cls](obj, cls)
        from vkit_tpu.utility.structure import structure as _structure
        try:
            return _structure(obj, cls)
        except (TypeError, KeyError) as ex:
            raise errors.ClassValidationError(str(ex)) from ex

    # -- unstructure ------------------------------------------------------

    def register_unstructure_hook_factory(self, predicate, factory):
        self._unstructure_hook_factories.append((predicate, factory))

    def register_unstructure_hook(self, cls, hook):
        self._structure_hooks[('un', cls)] = hook

    def unstructure(self, obj):
        for predicate, factory in self._unstructure_hook_factories:
            if predicate(type(obj)):
                return factory(type(obj))(obj)
        if _attr.has(type(obj)):
            return _attr.asdict(obj)
        return obj


class GenConverter(Converter):

    def __init__(self, forbid_extra_keys=False):
        super().__init__()
        self.forbid_extra_keys = forbid_extra_keys
