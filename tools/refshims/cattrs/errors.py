class ClassValidationError(Exception):
    pass
