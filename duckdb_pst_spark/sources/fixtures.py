"""Deterministic PST fixture generator (FIXTURES.md).

Mirrors the reference's golden test file `test/unittest.pst` (2.25 MiB;
16 folders, 12 messages = 5 notes + 2 contacts + 1 distribution list +
1 appointment + 2 sticky notes + 1 task —
/root/reference/test/sql/read_unittest_pst.test:14-93) as plain parquet
tables with the schemas of /root/reference/src/include/schema.hpp mapped
per SURVEY.md §1.2 (unsigned → widened signed, ENUM → constrained string,
TIMESTAMP_S → microsecond timestamp holding second-precision values).

Multiple "files" (distinct pst_path) are generated to exercise glob scans
— the reference's headline numbers come from 167-file globs
(README.md:8-20). Everything is seed-free and index-deterministic so the
DuckDB oracle can re-read the same parquet.
"""

from __future__ import annotations

import datetime as dt
import os
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_VERSION = "v1"
DEFAULT_N_FILES = 3

_CACHE_ROOT = Path(__file__).resolve().parent.parent.parent / ".cache" / "pstdata"

PST_TABLES = (
    "pst_folders",
    "pst_messages",
    "pst_contacts",
    "pst_appointments",
    "pst_sticky_notes",
    "pst_tasks",
    "pst_distribution_lists",
)

# ---- folder layout (schema.hpp:347-359; golden tree read_unittest_pst.test:22-37)
ROOT_NID = 290
TOP_NID = 32802
SEARCH_NID = 32834
_STANDARD_FOLDERS = [
    ("Deleted Items", "IPF.Note"),
    ("Inbox", "IPF.Note"),
    ("Outbox", "IPF.Note"),
    ("Sent Items", "IPF.Note"),
    ("Calendar", "IPF.Appointment"),
    ("Contacts", "IPF.Contact"),
    ("Journal", "IPF.Journal"),
    ("Notes", "IPF.StickyNote"),
    ("Tasks", "IPF.Task"),
    ("Drafts", "IPF.Note"),
    ("RSS Feeds", "IPF.Note.OutlookHomepage"),
    ("Conversation Action Settings", "IPF.Configuration"),
    ("Quick Step Settings", "IPF.Configuration"),
]

# message class mix of the golden file (README.md:25-37)
_CLASS_MIX = (
    ["IPM.Note"] * 5
    + ["IPM.Contact"] * 2
    + ["IPM.DistList"]
    + ["IPM.Appointment"]
    + ["IPM.StickyNote"] * 2
    + ["IPM.Task"]
)

_IMPORTANCE = ["LOW", "NORMAL", "HIGH"]  # schema.hpp:29-36
_PRIORITY = ["NONURGENT", "NORMAL", "URGENT"]
_SENSITIVITY = ["NONE", "PERSONAL", "PRIVATE", "CONFIDENTIAL"]
_RECIPIENT_TYPE = ["TO", "CC", "BCC"]

_T0 = dt.datetime(2025, 12, 20, 8, 0, 0)  # second precision throughout


def _ts(offset_s: int) -> dt.datetime:
    return _T0 + dt.timedelta(seconds=offset_s)


def _msg_nid(m: int) -> int:
    return 2097156 + 32 * m


def _folder_rows(path: str, name: str, rkey: bytes) -> list[dict]:
    meta = {"pst_path": path, "pst_name": name, "record_key": rkey}
    # message counts per folder from the class mix placement below
    counts = {"Inbox": 5, "Contacts": 3, "Calendar": 1, "Notes": 2, "Tasks": 1}
    rows = [
        dict(
            meta,
            node_id=ROOT_NID,
            parent_node_id=ROOT_NID,  # root self-loop (README.md:461-468)
            container_class=None,
            display_name="",
            subfolder_count=2,
            message_count=0,
            unread_message_count=0,
        ),
        dict(
            meta,
            node_id=TOP_NID,
            parent_node_id=ROOT_NID,
            container_class=None,
            display_name="Top of Outlook data file",
            subfolder_count=len(_STANDARD_FOLDERS),
            message_count=0,
            unread_message_count=0,
        ),
        dict(
            meta,
            node_id=SEARCH_NID,
            parent_node_id=ROOT_NID,
            container_class=None,
            display_name="Search Root",
            subfolder_count=0,
            message_count=0,
            unread_message_count=0,
        ),
    ]
    for k, (dname, cclass) in enumerate(_STANDARD_FOLDERS):
        n = counts.get(dname, 0)
        rows.append(
            dict(
                meta,
                node_id=32866 + 32 * k,
                parent_node_id=TOP_NID,
                container_class=cclass,
                display_name=dname,
                subfolder_count=0,
                message_count=n,
                unread_message_count=min(n, k % 3),
            )
        )
    return rows


def _folder_nid(dname: str) -> int:
    for k, (d, _) in enumerate(_STANDARD_FOLDERS):
        if d == dname:
            return 32866 + 32 * k
    raise KeyError(dname)


def _home_folder(message_class: str) -> int:
    return _folder_nid(
        {
            "IPM.Note": "Inbox",
            "IPM.Contact": "Contacts",
            "IPM.DistList": "Contacts",
            "IPM.Appointment": "Calendar",
            "IPM.StickyNote": "Notes",
            "IPM.Task": "Tasks",
        }[message_class]
    )


def _recipients(m: int) -> list[dict]:
    out = []
    for r in range((m % 3) + 1):
        nm = f"Recipient {m}-{r}"
        out.append(
            {
                "display_name": nm,
                "account_name": f"acct{m}_{r}",
                "email_address": f"r{m}_{r}@example.com",
                "address_type": "SMTP",
                "recipient_type": _RECIPIENT_TYPE[r % 3],
                "recipient_type_raw": (r % 3) + 1,
            }
        )
    return out


def _attachments(m: int) -> list[dict]:
    if m == 0:
        return [
            {
                "filename": "MEDIUM~2.JPG",
                "mime_type": "image/jpeg",
                "size": 43008,
                "attach_content_id": "cid-medium-2",
                "attach_method": "BY_VALUE",
                "is_message": False,
                "bytes": bytes([(7 * j) % 256 for j in range(64)]),
            },
            {
                "filename": "notes.txt",
                "mime_type": "text/plain",
                "size": 512,
                "attach_content_id": None,
                "attach_method": "BY_VALUE",
                "is_message": False,
                "bytes": b"attachment-body-" + bytes(str(m), "ascii"),
            },
        ]
    if m % 4 == 1:
        return [
            {
                "filename": f"file{m}.dat",
                "mime_type": "application/octet-stream",
                "size": 128 * m,
                "attach_content_id": None,
                "attach_method": "BY_VALUE",
                "is_message": False,
                "bytes": bytes([(m * 13 + j) % 256 for j in range(32)]),
            }
        ]
    return []


_WORDS = (
    "the quick brown fox jumps over lazy dog while mail flows through the "
    "archive and folders hold messages about meetings tasks and notes"
).split()


def _body(m: int, long: bool) -> str:
    n = 120 + 40 * m if long else 20 + m
    return " ".join(_WORDS[(m + j) % len(_WORDS)] for j in range(n))


def _message_rows(path: str, name: str, rkey: bytes) -> list[dict]:
    rows = []
    for m, mclass in enumerate(_CLASS_MIX):
        long_html = m < 8  # ≥6 rows with body_html > 50 chars (truncation test)
        body = _body(m, long=m % 2 == 0)
        body_html = ("<html><body>" + _body(m, long=True) + "</body></html>") if long_html else None
        rows.append(
            {
                "pst_path": path,
                "pst_name": name,
                "record_key": rkey,
                "node_id": _msg_nid(m),
                "parent_node_id": _home_folder(mclass),
                "subject": f"Message {m} ({mclass})",
                "body": body,
                "body_html": body_html,
                "display_name": f"Message {m}",
                "comment": None if m % 3 else f"comment {m}",
                "sender_name": f"Sender {m % 4}",
                "sender_email_address": f"sender{m % 4}@example.com",
                "recipients": _recipients(m),
                "has_attachments": len(_attachments(m)) > 0,
                "attachment_count": len(_attachments(m)),
                "attachments": _attachments(m),
                "importance": _IMPORTANCE[m % 3],
                "priority": _PRIORITY[m % 3],
                "sensitivity": _SENSITIVITY[m % 4],
                "creation_time": _ts(3600 * m),
                "last_modified": _ts(3600 * m + 600),
                "message_delivery_time": _ts(3600 * m + 60) if mclass == "IPM.Note" else None,
                "message_class": mclass,
                "message_flags": 1 + (m % 2) * 16,
                "message_size": 1024 * (m + 1),
                "conversation_topic": None if m == 9 else f"Topic {m % 3}",
                "internet_message_id": f"<msg{m}@{name}.example>",
            }
        )
    return rows


def _contact_rows(msgs: list[dict]) -> list[dict]:
    golden = [("Hopper", "Cat"), ("Linus", "Cat")]  # README.md:61-69
    out = []
    for i, msg in enumerate([r for r in msgs if r["message_class"] == "IPM.Contact"]):
        given, sur = golden[i % 2]
        out.append(
            dict(
                msg,
                given_name=given,
                surname=sur,
                email_address_1=f"{given.lower()}@cats.example",
                company_name="Feline Inc" if i == 0 else None,
                business_phone_number=f"+1-555-000{i}",
                mobile_phone_number=None,
                birthday=dt.datetime(2018 + i, 5, 4, 0, 0, 0),
                wedding_anniversary=None,
                gender=i % 3,
                mail_permission=True,
                send_rich_info=False,
                conversation_prohibited=False,
                disclose_recipients=i == 0,
            )
        )
    return out


def _appointment_rows(msgs: list[dict]) -> list[dict]:
    out = []
    for msg in [r for r in msgs if r["message_class"] == "IPM.Appointment"]:
        # golden: 2025-12-25 05:00 → 2025-12-26 05:00, 1440 min, all-day
        start = dt.datetime(2025, 12, 25, 5, 0, 0)
        end = dt.datetime(2025, 12, 26, 5, 0, 0)
        out.append(
            dict(
                msg,
                location="Cat Tree",
                start_time=start,
                end_time=end,
                duration=1440,
                all_day_event=True,
                is_meeting=False,
                organizer_name="Hopper Cat",
                required_attendees="Hopper Cat; Linus Cat",
                optional_attendees=None,
                meeting_workspace_url=None,
                busy_status=2,
                response_status=0,
                is_recurring=False,
                recurrence_pattern=None,
                is_private=msg["sensitivity"] in ("PRIVATE", "CONFIDENTIAL"),
            )
        )
    return out


def _sticky_rows(msgs: list[dict]) -> list[dict]:
    geo = [(3, 2051, 1565, 80, 80), (1, 640, 480, 120, 200)]  # read_unittest_pst.test:96-102
    out = []
    for i, msg in enumerate([r for r in msgs if r["message_class"] == "IPM.StickyNote"]):
        color, w, h, x, y = geo[i % 2]
        out.append(
            dict(
                msg,
                conversation_topic=None if i == 1 else msg["conversation_topic"],
                note_color=color,
                note_width=w,
                note_height=h,
                note_x=x,
                note_y=y,
            )
        )
    return out


def _task_rows(msgs: list[dict]) -> list[dict]:
    out = []
    for msg in [r for r in msgs if r["message_class"] == "IPM.Task"]:
        out.append(
            dict(
                msg,
                task_status=1,
                is_complete=False,
                percent_complete=0.25,
                start_date=dt.datetime(2025, 12, 22, 0, 0, 0),
                due_date=dt.datetime(2025, 12, 25, 0, 0, 0),  # read_unittest_pst.test:104-111
                date_completed=None,
                last_update=dt.datetime(2025, 12, 23, 9, 30, 0),
                estimated_effort=120,
                actual_effort=30,
                task_owner="Hopper Cat",
                task_assigner="Linus Cat",
                ownership=2,
                last_user="Hopper Cat",
                is_team_task=False,
                is_recurring=False,
            )
        )
    return out


def _dlist_rows(msgs: list[dict], contacts: list[dict]) -> list[dict]:
    member_ids = [c["node_id"] for c in contacts]
    out = []
    for msg in [r for r in msgs if r["message_class"] == "IPM.DistList"]:
        out.append(
            dict(
                msg,
                display_name="Cat Support Group",  # golden
                member_node_ids=member_ids,
                one_off_members=[
                    {
                        "display_name": "Ada Lovelace (ada@example.com)",
                        "address_type": "SMTP",
                        "email_address": "ada@example.com",
                    },
                    {
                        "display_name": "Grace Hopper (grace@example.com)",
                        "address_type": "SMTP",
                        "email_address": "grace@example.com",
                    },
                ],
            )
        )
    return out


# --------------------------------------------------------------- schemas
_RECIPIENT_T = pa.struct(
    [
        ("display_name", pa.string()),
        ("account_name", pa.string()),
        ("email_address", pa.string()),
        ("address_type", pa.string()),
        ("recipient_type", pa.string()),
        ("recipient_type_raw", pa.int32()),
    ]
)
_ATTACHMENT_T = pa.struct(
    [
        ("filename", pa.string()),
        ("mime_type", pa.string()),
        ("size", pa.int64()),
        ("attach_content_id", pa.string()),
        ("attach_method", pa.string()),
        ("is_message", pa.bool_()),
        ("bytes", pa.binary()),
    ]
)
_ONE_OFF_T = pa.struct(
    [
        ("display_name", pa.string()),
        ("address_type", pa.string()),
        ("email_address", pa.string()),
    ]
)

_META_FIELDS = [
    ("pst_path", pa.string()),
    ("pst_name", pa.string()),
    ("record_key", pa.binary()),
    ("node_id", pa.int64()),
    ("parent_node_id", pa.int64()),
]
_MSG_FIELDS = _META_FIELDS + [
    ("subject", pa.string()),
    ("body", pa.string()),
    ("body_html", pa.string()),
    ("display_name", pa.string()),
    ("comment", pa.string()),
    ("sender_name", pa.string()),
    ("sender_email_address", pa.string()),
    ("recipients", pa.list_(_RECIPIENT_T)),
    ("has_attachments", pa.bool_()),
    ("attachment_count", pa.int64()),
    ("attachments", pa.list_(_ATTACHMENT_T)),
    ("importance", pa.string()),
    ("priority", pa.string()),
    ("sensitivity", pa.string()),
    ("creation_time", pa.timestamp("us")),
    ("last_modified", pa.timestamp("us")),
    ("message_delivery_time", pa.timestamp("us")),
    ("message_class", pa.string()),
    ("message_flags", pa.int32()),
    ("message_size", pa.int64()),
    ("conversation_topic", pa.string()),
    ("internet_message_id", pa.string()),
]

_SCHEMAS: dict[str, pa.Schema] = {
    "pst_folders": pa.schema(
        _META_FIELDS
        + [
            ("container_class", pa.string()),
            ("display_name", pa.string()),
            ("subfolder_count", pa.int64()),
            ("message_count", pa.int64()),
            ("unread_message_count", pa.int64()),
        ]
    ),
    "pst_messages": pa.schema(_MSG_FIELDS),
    "pst_contacts": pa.schema(
        _MSG_FIELDS
        + [
            ("given_name", pa.string()),
            ("surname", pa.string()),
            ("email_address_1", pa.string()),
            ("company_name", pa.string()),
            ("business_phone_number", pa.string()),
            ("mobile_phone_number", pa.string()),
            ("birthday", pa.timestamp("us")),
            ("wedding_anniversary", pa.timestamp("us")),
            ("gender", pa.int16()),
            ("mail_permission", pa.bool_()),
            ("send_rich_info", pa.bool_()),
            ("conversation_prohibited", pa.bool_()),
            ("disclose_recipients", pa.bool_()),
        ]
    ),
    "pst_appointments": pa.schema(
        _MSG_FIELDS
        + [
            ("location", pa.string()),
            ("start_time", pa.timestamp("us")),
            ("end_time", pa.timestamp("us")),
            ("duration", pa.int32()),
            ("all_day_event", pa.bool_()),
            ("is_meeting", pa.bool_()),
            ("organizer_name", pa.string()),
            ("required_attendees", pa.string()),
            ("optional_attendees", pa.string()),
            ("meeting_workspace_url", pa.string()),
            ("busy_status", pa.int32()),
            ("response_status", pa.int32()),
            ("is_recurring", pa.bool_()),
            ("recurrence_pattern", pa.string()),
            ("is_private", pa.bool_()),
        ]
    ),
    "pst_sticky_notes": pa.schema(
        _MSG_FIELDS
        + [
            ("note_color", pa.int32()),
            ("note_width", pa.int32()),
            ("note_height", pa.int32()),
            ("note_x", pa.int32()),
            ("note_y", pa.int32()),
        ]
    ),
    "pst_tasks": pa.schema(
        _MSG_FIELDS
        + [
            ("task_status", pa.int32()),
            ("is_complete", pa.bool_()),
            ("percent_complete", pa.float64()),
            ("start_date", pa.timestamp("us")),
            ("due_date", pa.timestamp("us")),
            ("date_completed", pa.timestamp("us")),
            ("last_update", pa.timestamp("us")),
            ("estimated_effort", pa.int32()),
            ("actual_effort", pa.int32()),
            ("task_owner", pa.string()),
            ("task_assigner", pa.string()),
            ("ownership", pa.int32()),
            ("last_user", pa.string()),
            ("is_team_task", pa.bool_()),
            ("is_recurring", pa.bool_()),
        ]
    ),
    "pst_distribution_lists": pa.schema(
        _MSG_FIELDS
        + [
            ("member_node_ids", pa.list_(pa.int64())),
            ("one_off_members", pa.list_(_ONE_OFF_T)),
        ]
    ),
}


def fixture_dir(n_files: int = DEFAULT_N_FILES) -> str:
    return str(_CACHE_ROOT / f"{FIXTURE_VERSION}_{n_files}")


def generate(n_files: int = DEFAULT_N_FILES, *, force: bool = False) -> str:
    """Write the fixture parquet tables; idempotent. Returns the dir."""
    out = Path(fixture_dir(n_files))
    marker = out / "_SUCCESS"
    if marker.exists() and not force:
        return str(out)
    out.mkdir(parents=True, exist_ok=True)

    data: dict[str, list[dict]] = {t: [] for t in PST_TABLES}
    for i in range(n_files):
        name = f"fix{i:03d}"
        path = f"fixtures/{name}.pst"
        rkey = bytes([(i * 7 + j * 11) % 256 for j in range(16)])
        folders = _folder_rows(path, name, rkey)
        msgs = _message_rows(path, name, rkey)
        contacts = _contact_rows(msgs)
        data["pst_folders"] += folders
        data["pst_messages"] += msgs
        data["pst_contacts"] += contacts
        data["pst_appointments"] += _appointment_rows(msgs)
        data["pst_sticky_notes"] += _sticky_rows(msgs)
        data["pst_tasks"] += _task_rows(msgs)
        data["pst_distribution_lists"] += _dlist_rows(msgs, contacts)

    for t, rows in data.items():
        schema = _SCHEMAS[t]
        cols = {f.name for f in schema}
        cleaned = [{k: v for k, v in r.items() if k in cols} for r in rows]
        pq.write_table(pa.Table.from_pylist(cleaned, schema=schema), out / f"{t}.parquet")
    marker.touch()
    return str(out)
