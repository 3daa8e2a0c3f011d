"""Root-level config shim for reference-CLI compatibility.

The reference exposed a module-level ``cfg`` dict at the repo root
(reference config.py:39-95) imported as ``from config import cfg``
everywhere. The real configuration lives in ``rtvc_tpu.config`` (typed
dataclasses); this shim re-exports the default instance, which supports the
same ``cfg['TRAIN']['BATCH_SIZE']`` style access.
"""

from rtvc_tpu.config import Config, cfg, from_dict

__all__ = ["Config", "cfg", "from_dict"]
