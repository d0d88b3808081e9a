from .queries import ANALYTIC_QUERIES  # noqa: F401
