from .validate import validate_transformer, episodic_validate

__all__ = ["validate_transformer", "episodic_validate"]
