"""Permission / role surface for the engine's extension registry.

Reference analog: MTBValidationPermissions.scala:12-39 — a domain-
scoped validation permission set (``ValidationPermissions("MTB")``)
exposed through a ``PermissionsSPI``, a role set derived from it
(``ValidationRoles``), and a name round-trip contract (pattern-matching
a permission's printed name back to the permission, PermissionTests
.scala:31-39).  The engine re-expresses that surface on its own plugin
registry (rules/core.py RuleSet plugins): permissions are value
objects, providers register under a name, and parsing a printed name
recovers the permission object.

This is an authorization *vocabulary*, not an enforcement layer — the
engine is a data-processing library; callers (a service embedding it)
check ``permission in role`` before invoking the matching pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

# the validation-service operations a caller can be granted, mirroring
# the reference's validation permission set (read the validation-infos
# listing, read one report, read the offending record, re-run
# validation)
OPERATIONS: tuple[str, ...] = (
    "read_validation_infos",
    "read_validation_report",
    "read_invalid_record",
    "revalidate",
)

READ_OPERATIONS: tuple[str, ...] = OPERATIONS[:3]


@dataclass(frozen=True)
class Permission:
    domain: str
    operation: str

    @property
    def name(self) -> str:
        return f"{self.domain}:{self.operation}"


class PermissionSet:
    """All permissions of one validation domain, with the printed-name
    round-trip the reference tests (name → Permission)."""

    def __init__(self, domain: str):
        self.domain = domain
        self._all = tuple(Permission(domain, op) for op in OPERATIONS)
        self._by_name = {p.name: p for p in self._all}

    def all(self) -> tuple[Permission, ...]:
        return self._all

    def parse(self, name: str) -> Permission | None:
        """Inverse of ``Permission.name`` — None for foreign names."""
        return self._by_name.get(name)

    def __contains__(self, p: Permission) -> bool:
        return p in self._all

    def __iter__(self):
        return iter(self._all)


@dataclass(frozen=True)
class Role:
    name: str
    permissions: frozenset[Permission]

    def __contains__(self, p: Permission) -> bool:
        return p in self.permissions


def validation_roles(perms: PermissionSet) -> dict[str, Role]:
    """The reference's role derivation: a viewer role carrying the read
    permissions and a full role carrying everything."""
    reads = frozenset(
        p for p in perms if p.operation in READ_OPERATIONS
    )
    return {
        "viewer": Role(f"{perms.domain}-viewer", reads),
        "validator": Role(f"{perms.domain}-validator", frozenset(perms)),
    }


# --- SPI: named providers, same shape as RuleSet.register_plugin ----------

_PROVIDERS: dict[str, Callable[[], PermissionSet]] = {}


def register_permissions(name: str, provider: Callable[[], PermissionSet]) -> None:
    _PROVIDERS[name] = provider


def get_permissions(name: str) -> PermissionSet:
    if name not in _PROVIDERS:
        raise KeyError(
            f"no permissions provider {name!r}; registered: {sorted(_PROVIDERS)}"
        )
    return _PROVIDERS[name]()


IMAGE_VALIDATION_PERMISSIONS = PermissionSet("image-validation")
register_permissions("image-validation", lambda: IMAGE_VALIDATION_PERMISSIONS)
