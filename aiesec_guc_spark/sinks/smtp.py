"""SMTP transport for the guarded notification sink (reference S7,
aiesec.py:236-251).

The reference builds a MIME multipart message and ships it through
``smtplib.SMTP("smtp.gmail.com", 587)`` with STARTTLS and a hardcoded
app password.  This twin keeps the executable protocol path — a real
``smtplib`` client speaking RFC 5321 to a configurable host/port — but
takes credentials from the environment (the reference's committed
password is a leaked secret, not a feature) and leaves TLS optional so
hermetic tests can run against a loopback server.

Driver-side by design: the send happens once per run with an
already-reduced body (the delta is small by construction); nothing
here touches executors.

Usage with the guarded sink::

    transport = SMTPTransport(host, port, sender, recipients, subject)
    notify_if_nonempty(delta, send=transport, renderer=render_email_html)
"""

from __future__ import annotations

import os
import smtplib
from dataclasses import dataclass, field
from email.mime.multipart import MIMEMultipart
from email.mime.text import MIMEText

#: Env var names for credentials — never hardcoded (see module doc).
SMTP_USER_ENV = "SPARK_GRAFT_SMTP_USER"
SMTP_PASSWORD_ENV = "SPARK_GRAFT_SMTP_PASSWORD"


def build_message(
    sender: str, recipients: list[str], subject: str, html_body: str
) -> MIMEMultipart:
    """The reference's MIME shape (aiesec.py:239-244): multipart
    container, text/html part, From/To/Subject headers."""
    msg = MIMEMultipart("alternative")
    msg["From"] = sender
    msg["To"] = ", ".join(recipients)
    msg["Subject"] = subject
    msg.attach(MIMEText(html_body, "html"))
    return msg


@dataclass
class SMTPTransport:
    """Callable transport: ``transport(html_body)`` sends one message.

    ``use_tls`` upgrades the session with STARTTLS before auth (the
    reference's Gmail path); login happens only when a user is present
    in the environment, so anonymous loopback servers work unchanged.
    """

    host: str
    port: int
    sender: str
    recipients: list[str]
    subject: str = "New Opportunities"
    use_tls: bool = False
    timeout: float = 30.0
    #: Injection seam for tests/doubles; defaults to smtplib.SMTP.
    smtp_factory: type = field(default=smtplib.SMTP, repr=False)

    def __call__(self, html_body: str) -> None:
        msg = build_message(self.sender, self.recipients, self.subject, html_body)
        user = os.environ.get(SMTP_USER_ENV)
        password = os.environ.get(SMTP_PASSWORD_ENV)
        with self.smtp_factory(self.host, self.port, timeout=self.timeout) as conn:
            if self.use_tls:
                conn.starttls()
            if user and password:
                conn.login(user, password)
            conn.sendmail(self.sender, self.recipients, msg.as_string())
