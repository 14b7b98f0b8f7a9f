from .sse import SSEDataSource, register_sse_source  # noqa: F401
