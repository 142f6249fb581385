"""Vorbis comment (tag) data.

Reference: NVorbis/TagData.cs.  Deviation: values are split at the *first*
'=' per the Vorbis comment spec (the reference's ``Split('=')`` truncates
values containing '='); the ``KEY[qualifier]=value`` convention is kept.
"""


class TagData:
    def __init__(self, vendor: str = "", comments=()):
        self.encoder_vendor = vendor or ""
        tags = {}
        for comment in comments:
            key, sep, value = comment.partition("=")
            if not sep:
                value = ""
            bkt = key.find("[")
            if bkt > -1:
                value = key[bkt + 1 : len(key) - 1].upper() + ": " + value
                key = key[:bkt]
            tags.setdefault(key.upper(), []).append(value)
        self._tags = tags

    def get_tag_single(self, key: str, concatenate: bool = False) -> str:
        values = self.get_tag_multi(key)
        if values:
            if concatenate:
                return "\n".join(values)
            return values[-1]
        return ""

    def get_tag_multi(self, key: str):
        return self._tags.get(key.upper(), [])

    @property
    def all(self):
        return dict(self._tags)

    # typed accessors (TagData.cs:76-104)
    @property
    def title(self):
        return self.get_tag_single("TITLE")

    @property
    def version(self):
        return self.get_tag_single("VERSION")

    @property
    def album(self):
        return self.get_tag_single("ALBUM")

    @property
    def track_number(self):
        return self.get_tag_single("TRACKNUMBER")

    @property
    def artist(self):
        return self.get_tag_single("ARTIST")

    @property
    def performers(self):
        return self.get_tag_multi("PERFORMER")

    @property
    def copyright(self):
        return self.get_tag_single("COPYRIGHT")

    @property
    def license(self):
        return self.get_tag_single("LICENSE")

    @property
    def organization(self):
        return self.get_tag_single("ORGANIZATION")

    @property
    def description(self):
        return self.get_tag_single("DESCRIPTION")

    @property
    def genres(self):
        return self.get_tag_multi("GENRE")

    @property
    def dates(self):
        return self.get_tag_multi("DATE")

    @property
    def locations(self):
        return self.get_tag_multi("LOCATION")

    @property
    def contact(self):
        return self.get_tag_single("CONTACT")

    @property
    def isrc(self):
        return self.get_tag_single("ISRC")
