"""python-barcode writer-module shim (BaseWriter + mm2px): just enough
for the reference's NoTextImageWriter subclass, same defaults as
python-barcode."""


def mm2px(mm: float, dpi: int = 300) -> float:
    return (mm * dpi) / 25.4


class BaseWriter:

    def __init__(self, initialize=None, paint_module=None, paint_text=None,
                 finish=None):
        self._callbacks = {
            'initialize': initialize,
            'paint_module': paint_module,
            'paint_text': paint_text,
            'finish': finish,
        }
        self.module_width = 0.2
        self.module_height = 15.0
        self.font_size = 10
        self.quiet_zone = 6.5
        self.background = 'white'
        self.foreground = 'black'
        self.text = ''
        self.human = ''

    def render(self, code):
        if self._callbacks['initialize']:
            self._callbacks['initialize'](code)
        ypos = 1.0
        for line in code:
            xpos = self.quiet_zone
            for mod in line:
                color = self.foreground if mod == '1' else self.background
                self._callbacks['paint_module'](
                    xpos, ypos, self.module_width, color
                )
                xpos += self.module_width
            ypos += self.module_height
        return self._callbacks['finish']()
