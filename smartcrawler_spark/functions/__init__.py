from . import relevance, templates, textops, urls  # noqa: F401
