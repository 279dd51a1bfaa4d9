from xitorch_tpu._docstr.api_docstr import get_methods_docstr  # noqa: F401
