from .image import imagenet_normalize, load_image, prepare, to_array

__all__ = ["imagenet_normalize", "load_image", "prepare", "to_array"]
