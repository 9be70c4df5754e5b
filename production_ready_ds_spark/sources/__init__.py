"""Custom sources: the reference's API-fetch stages as real Spark
sources."""

from .api_source import PostsApiDataSource, register_posts_api

__all__ = ["PostsApiDataSource", "register_posts_api"]
