"""Root conftest: make the in-repo package importable without install."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))
