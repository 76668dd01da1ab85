"""Minimal iolite stand-in for running the reference (path + json helpers)."""
import json
import os
from pathlib import Path


def _prep(path, expandvars=False):
    path = os.fspath(path)
    if expandvars:
        path = os.path.expandvars(path)
    return Path(path)


def file(path, expandvars=False, exists=False):
    p = _prep(path, expandvars)
    if exists:
        assert p.is_file(), f'{p} does not exist'
    return p


def folder(path, expandvars=False, exists=False, touch=False, reset=False):
    p = _prep(path, expandvars)
    if reset:
        import shutil
        shutil.rmtree(p, ignore_errors=True)
    if touch or reset:
        p.mkdir(parents=True, exist_ok=True)
    if exists:
        assert p.is_dir(), f'{p} does not exist'
    return p


def read_json(path, expandvars=False):
    return json.loads(_prep(path, expandvars).read_text())


def write_json(path, data, **kwargs):
    _prep(path).write_text(json.dumps(data, **kwargs))
