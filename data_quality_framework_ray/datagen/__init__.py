from data_quality_framework_ray.datagen.clips import generate_clips  # noqa: F401
