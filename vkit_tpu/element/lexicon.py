"""Lexicon + LexiconCollection.

Capability parity: vkit/element/lexicon.py:25-117.
"""
import hashlib
import json
import os
from collections import defaultdict
from typing import DefaultDict, List, Mapping, Optional, Sequence

import attr

from ..utility.structure import structure
from ..utility.type import PathType

KEY_NO_TAG = '__no_tag'


@attr.define(frozen=True)
class Lexicon:
    char: str
    aliases: Sequence[str] = attr.field(factory=tuple, converter=tuple)
    tags: Sequence[str] = attr.field(factory=tuple, converter=tuple)
    meta: Optional[Mapping[str, str]] = None

    @property
    def char_and_aliases(self):
        return [self.char, *self.aliases]

    @property
    def unicode_id(self) -> str:
        return hex(ord(self.char)).upper()[2:]


@attr.define
class LexiconCollection:
    lexicons: Sequence[Lexicon]
    _cache: dict = attr.field(factory=dict, repr=False, init=False)

    def _build_indices(self):
        char_to_lexicon = {}
        for lexicon in self.lexicons:
            for char in lexicon.char_and_aliases:
                assert char not in char_to_lexicon
                char_to_lexicon[char] = lexicon

        tag_to_lexicons: DefaultDict[str, List[Lexicon]] = defaultdict(list)
        for lexicon in self.lexicons:
            if lexicon.tags:
                for tag in lexicon.tags:
                    tag_to_lexicons[tag].append(lexicon)
            else:
                tag_to_lexicons[KEY_NO_TAG].append(lexicon)

        self._cache['char_to_lexicon'] = char_to_lexicon
        self._cache['tag_to_lexicons'] = dict(tag_to_lexicons)
        self._cache['tags'] = sorted(tag_to_lexicons)

    @property
    def char_to_lexicon(self) -> Mapping[str, Lexicon]:
        if 'char_to_lexicon' not in self._cache:
            self._build_indices()
        return self._cache['char_to_lexicon']

    @property
    def tag_to_lexicons(self) -> Mapping[str, Sequence[Lexicon]]:
        if 'tag_to_lexicons' not in self._cache:
            self._build_indices()
        return self._cache['tag_to_lexicons']

    @property
    def tags(self) -> Sequence[str]:
        if 'tags' not in self._cache:
            self._build_indices()
        return self._cache['tags']

    def has_char(self, char: str) -> bool:
        return char in self.char_to_lexicon

    def get_lexicon(self, char: str) -> Lexicon:
        return self.char_to_lexicon[char]

    @classmethod
    def from_file(cls, path: PathType) -> 'LexiconCollection':
        path = os.path.expandvars(os.fspath(path))
        with open(path) as fin:
            raw = json.load(fin)
        lexicons = [structure(item, Lexicon) for item in raw]
        return cls(lexicons=lexicons)

    def to_file(self, path: PathType):
        path = os.path.expandvars(os.fspath(path))
        raw = [
            {
                'char': lexicon.char,
                'aliases': list(lexicon.aliases),
                'tags': list(lexicon.tags),
                'meta': dict(lexicon.meta) if lexicon.meta else None,
            }
            for lexicon in self.lexicons
        ]
        with open(path, 'w') as fout:
            json.dump(raw, fout, indent=2, ensure_ascii=False)

    def get_hash(self) -> str:
        sha256_algo = hashlib.sha256()
        for lexicon in self.lexicons:
            sha256_algo.update(lexicon.char.encode())
            for alias in lexicon.aliases:
                sha256_algo.update(alias.encode())
        return sha256_algo.hexdigest()
