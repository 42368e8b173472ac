"""DSL user-error hierarchy (cf. loma_public/error.py:8-186).

Same error taxonomy and line-number reporting as the reference so that
reference test expectations translate; plain exception classes instead of
attrs-frozen dataclasses.
"""

from __future__ import annotations


class UserError(Exception):
    def __init__(self, msg: str, lineno=None):
        self.lineno = lineno
        super().__init__(f"line {lineno}: {msg}" if lineno else msg)

    def to_string(self) -> str:
        return str(self)


class DuplicateVariable(UserError):
    def __init__(self, var: str, first_lineno=None, duplicate_lineno=None):
        self.var = var
        self.first_declare_stmt = first_lineno
        self.duplicate_declare_stmt = duplicate_lineno
        super().__init__(f"duplicate declaration of '{var}'", duplicate_lineno)


class UndeclaredVariable(UserError):
    def __init__(self, var: str, lineno=None):
        self.var = var
        super().__init__(f"use of undeclared variable '{var}'", lineno)


class ReturnNotLastStmt(UserError):
    def __init__(self, lineno=None):
        super().__init__("return must be the last statement", lineno)


class DeclareUnboundedArray(UserError):
    def __init__(self, lineno=None):
        super().__init__("locally declared arrays must have a static size",
                         lineno)


class DeclarationNotOutmostLevel(UserError):
    def __init__(self, lineno=None):
        super().__init__("declarations must be at the outermost scope", lineno)


class CallWithOutArgNotInCallStmt(UserError):
    def __init__(self, lineno=None):
        super().__init__(
            "calls with Out arguments must appear as standalone statements",
            lineno,
        )


class TypeMismatch(UserError):
    pass


class UnknownFunction(UserError):
    def __init__(self, name: str, lineno=None):
        super().__init__(f"call to unknown function '{name}'", lineno)


class ParseError(UserError):
    pass
