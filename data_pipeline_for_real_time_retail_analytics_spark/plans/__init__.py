from .validation import (
    Severity,
    ValidationEngine,
    ValidationReport,
    ValidationRule,
)

__all__ = ["Severity", "ValidationEngine", "ValidationReport", "ValidationRule"]
