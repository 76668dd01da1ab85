"""pytz shim over stdlib zoneinfo (reference char_sampler/datetime.py)."""
from zoneinfo import ZoneInfo, available_timezones

all_timezones = sorted(available_timezones())
common_timezones = all_timezones
utc = ZoneInfo('UTC')


def timezone(name: str) -> ZoneInfo:
    return ZoneInfo(name)
