"""MIME groups for the rule DSL.

Same group surface as memorious/logic/mime.py:1-78 (`web`, `images`,
`media`, `documents`, `archives`, `assets`) — membership lists are a
fresh transcription of the common MIME types those groups cover, not a
copy; the rule semantics that matter (prefix ``group/`` OR membership,
rule.py:96-100) live in :mod:`memorious_spark.plans.rules`.
"""

from __future__ import annotations

GROUPS: dict[str, list[str]] = {
    "web": [
        "text/html",
        "application/xhtml+xml",
        "text/plain",
        "application/xml",
        "text/xml",
    ],
    "images": [
        "image/png",
        "image/jpeg",
        "image/gif",
        "image/bmp",
        "image/webp",
        "image/tiff",
        "image/svg+xml",
        "image/x-icon",
    ],
    "media": [
        "audio/mpeg",
        "audio/ogg",
        "audio/wav",
        "video/mp4",
        "video/webm",
        "video/x-msvideo",
        "video/quicktime",
    ],
    "documents": [
        "application/pdf",
        "application/msword",
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
        "application/vnd.ms-excel",
        "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
        "application/vnd.ms-powerpoint",
        "application/vnd.openxmlformats-officedocument.presentationml.presentation",
        "application/rtf",
        "application/vnd.oasis.opendocument.text",
    ],
    "archives": [
        "application/zip",
        "application/x-tar",
        "application/x-gzip",
        "application/gzip",
        "application/x-7z-compressed",
        "application/x-rar-compressed",
        "application/x-bzip2",
    ],
    "assets": [
        "text/css",
        "text/javascript",
        "application/javascript",
        "application/json",
        "font/woff",
        "font/woff2",
        "application/vnd.ms-fontobject",
    ],
}

# Mime types whose bodies are never parsed as HTML
# (memorious/logic/mime.py NON_HTML shape: docs/archives/media/images/assets).
NON_HTML: frozenset[str] = frozenset(
    t
    for g in ("images", "media", "documents", "archives", "assets")
    for t in GROUPS[g]
)


def normalize_mimetype(value: str | None) -> str:
    """Lowercase, strip parameters; unknown → application/octet-stream."""
    if value is None:
        return "application/octet-stream"
    value = value.split(";", 1)[0].strip().lower()
    return value or "application/octet-stream"
