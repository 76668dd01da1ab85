import attr as _attr


def make_dict_unstructure_fn(cls, converter, **field_overrides):
    omitted = {
        name for name, override in field_overrides.items()
        if isinstance(override, dict) and override.get('omit')
    }

    def unstructure(obj):
        out = {}
        for field in _attr.fields(type(obj)):
            if field.name in omitted:
                continue
            out[field.name] = converter.unstructure(getattr(obj, field.name))
        return out

    return unstructure
