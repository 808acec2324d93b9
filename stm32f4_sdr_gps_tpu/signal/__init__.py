from . import ca_code, capture, nav_message, simulator  # noqa: F401
