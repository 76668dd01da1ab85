"""Faker shim: the reference's faker char sampler draws words from
Faker(locale) method calls (vkit/engine/char_sampler/faker.py:19-100).
A tiny deterministic word source stands in — the measurement pipeline
uses the corpus sampler, so this only needs to import cleanly."""
import random

_WORDS = (
    'lorem ipsum dolor sit amet consectetur adipiscing elit sed do '
    'eiusmod tempor incididunt ut labore et dolore magna aliqua'
).split()


class Faker:

    def __init__(self, locale=None, *args, **kwargs):
        self._random = random.Random(0)

    def seed_instance(self, seed):
        self._random = random.Random(seed)

    def _words(self, n):
        return ' '.join(self._random.choice(_WORDS) for _ in range(n))

    def __getattr__(self, name):
        if name.startswith('_'):
            raise AttributeError(name)

        def method(*args, **kwargs):
            return self._words(2)

        return method
