from .config import RuntimeConfig, default_config  # noqa: F401
from .progress import display_progress  # noqa: F401
from .hashing import file_hash_blake2b, file_hash_md5_tail  # noqa: F401
