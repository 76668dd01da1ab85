"""python-barcode shim: the Code39 subset the reference's code39 engine
uses (vkit/engine/barcode/code39.py:20-151).  Bar patterns come from the
first-party symbology table (vkit_tpu/engine/barcode/code39.py)."""
from vkit_tpu.engine.barcode.code39 import render_code39_row

# MOD43 value order for the optional checksum digit.
_MOD43 = '0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ-. $/+%'


class Code39:

    def __init__(self, code: str, writer=None, add_checksum: bool = True):
        self.code = code.upper()
        if add_checksum:
            total = sum(_MOD43.index(c) for c in self.code if c in _MOD43)
            self.code += _MOD43[total % 43]
        self.writer = writer

    def build(self):
        row = render_code39_row(self.code)
        return [''.join('1' if v else '0' for v in row)]

    def render(self, writer_options=None):
        return self.writer.render(self.build())
