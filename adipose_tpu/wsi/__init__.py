from adipose_tpu.wsi import chunker, ecm, reconstruct, overlay

__all__ = ["chunker", "ecm", "reconstruct", "overlay"]
