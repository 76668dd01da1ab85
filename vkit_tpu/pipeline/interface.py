"""Pipeline framework: typed state store + reflective step auto-wiring.

Capability parity: vkit/pipeline/interface.py:46-254.  ``Pipeline.run``
stores each step's output keyed by its snake-cased class name; the next
step's input attrs class is built by looking up each field's annotated type
in the state (auto-wired DAG).
"""
import typing
from typing import (
    Any,
    Dict,
    Generic,
    List,
    Mapping,
    Optional,
    Sequence,
    Type,
    TypeVar,
    Union,
    cast,
)

import attr
from numpy.random import Generator as RandomGenerator

from ..utility import (
    PathType,
    convert_camel_case_name_to_snake_case_name,
    dyn_structure,
    get_generic_classes,
    read_json_file,
)

_T_VALUE = TypeVar('_T_VALUE')
_T_CONFIG = TypeVar('_T_CONFIG')
_T_INPUT = TypeVar('_T_INPUT')
_T_OUTPUT = TypeVar('_T_OUTPUT')


def _is_path_type(obj: Any) -> bool:
    import os
    return isinstance(obj, (str, os.PathLike))


@attr.define
class PipelineState:
    key_to_value: Dict[str, Any] = attr.field(factory=dict)

    def get_value(self, key: str, value_cls: Type[_T_VALUE]) -> _T_VALUE:
        if key not in self.key_to_value:
            raise KeyError(f'key={key} not found.')
        value = self.key_to_value[key]
        if not isinstance(value, value_cls):
            raise TypeError(
                f'key={key}, value type={type(value)} is not instance of {value_cls}'
            )
        return value

    def set_value(self, key: str, value: Any, override: bool = False):
        if key in self.key_to_value and not override:
            raise KeyError(f'key={key} exists but override is not set.')
        self.key_to_value[key] = value


class PipelineStep(Generic[_T_CONFIG, _T_INPUT, _T_OUTPUT]):

    _cached_name: str = ''

    @classmethod
    def get_config_cls(cls) -> Type[_T_CONFIG]:
        return get_generic_classes(cls)[0]  # type: ignore[return-value]

    @classmethod
    def get_input_cls(cls) -> Type[_T_INPUT]:
        return get_generic_classes(cls)[1]  # type: ignore[return-value]

    @classmethod
    def get_output_cls(cls) -> Type[_T_OUTPUT]:
        return get_generic_classes(cls)[2]  # type: ignore[return-value]

    @classmethod
    def get_name(cls) -> str:
        if not cls.__dict__.get('_cached_name'):
            cls._cached_name = convert_camel_case_name_to_snake_case_name(cls.__name__)
        return cls._cached_name

    def __init__(self, config: _T_CONFIG):
        self.config = config

    def run(self, input: _T_INPUT, rng: RandomGenerator) -> _T_OUTPUT:
        raise NotImplementedError()


class PipelineStepFactory(Generic[_T_CONFIG, _T_INPUT, _T_OUTPUT]):

    def __init__(self, pipeline_step_cls: Type[PipelineStep]):
        self.pipeline_step_cls = pipeline_step_cls

    @property
    def name(self) -> str:
        return self.pipeline_step_cls.get_name()

    def get_config_cls(self):
        return self.pipeline_step_cls.get_config_cls()

    def create(
        self,
        config: Optional[Union[Mapping[str, Any], PathType, _T_CONFIG]] = None,
    ) -> PipelineStep:
        config = dyn_structure(
            config,
            self.get_config_cls(),
            support_path_type=True,
            support_none_type=True,
        )
        return self.pipeline_step_cls(config)


class PipelineStepCollectionFactory:

    def __init__(self):
        self.name_to_step_factory: Dict[str, PipelineStepFactory] = {}

    def register_step_factories(
        self,
        namespace: str,
        step_factories: Sequence[PipelineStepFactory],
    ):
        for step_factory in step_factories:
            name = f'{namespace}.{step_factory.name}'
            assert name not in self.name_to_step_factory
            self.name_to_step_factory[name] = step_factory

    def create(
        self,
        step_configs: Union[Sequence[Mapping[str, Any]], PathType],
    ) -> List[PipelineStep]:
        if _is_path_type(step_configs):
            step_configs = read_json_file(step_configs)
        step_configs = cast(Sequence[Mapping[str, Any]], step_configs)

        steps: List[PipelineStep] = []
        for step_config in step_configs:
            name = step_config['name']
            if name not in self.name_to_step_factory:
                raise KeyError(f'name={name} not found.')
            steps.append(
                self.name_to_step_factory[name].create(step_config.get('config'))
            )
        return steps


class PipelinePostProcessor(Generic[_T_CONFIG, _T_INPUT, _T_OUTPUT]):

    def __init__(self, config: _T_CONFIG):
        self.config = config

    @classmethod
    def get_input_cls(cls) -> Type[_T_INPUT]:
        return get_generic_classes(cls)[1]  # type: ignore[return-value]

    def generate_output(self, input: _T_INPUT, rng: RandomGenerator) -> _T_OUTPUT:
        raise NotImplementedError()


class PipelinePostProcessorFactory(Generic[_T_CONFIG, _T_INPUT, _T_OUTPUT]):

    def __init__(self, pipeline_post_processor_cls: Type[PipelinePostProcessor]):
        self.pipeline_post_processor_cls = pipeline_post_processor_cls

    def get_config_cls(self) -> Type[_T_CONFIG]:
        return get_generic_classes(self.pipeline_post_processor_cls)[0]  # type: ignore

    def create(
        self,
        config: Optional[Union[Mapping[str, Any], PathType, _T_CONFIG]] = None,
    ) -> PipelinePostProcessor:
        config = dyn_structure(
            config,
            self.get_config_cls(),
            support_path_type=True,
            support_none_type=True,
        )
        return self.pipeline_post_processor_cls(config)


@attr.define
class PipelineRunRngStateOutput:
    rng_state: Mapping[str, Any]


class Pipeline(Generic[_T_OUTPUT]):

    def __init__(
        self,
        steps: Sequence[PipelineStep],
        post_processor: PipelinePostProcessor,
    ):
        self.steps = steps
        self.post_processor = post_processor

    @classmethod
    def build_input(cls, state: PipelineState, input_cls: Any):
        assert attr.has(input_cls)
        hints = typing.get_type_hints(input_cls)
        input_kwargs = {}
        for field in attr.fields(input_cls):
            field_type = hints[field.name]
            input_kwargs[field.name] = state.get_value(
                convert_camel_case_name_to_snake_case_name(field_type.__name__),
                field_type,
            )
        return input_cls(**input_kwargs)

    def run(
        self,
        rng: RandomGenerator,
        state: Optional[PipelineState] = None,
    ) -> _T_OUTPUT:
        if state is None:
            state = PipelineState()

        # Reproducibility capture (vkit/pipeline/interface.py:227-231).
        state.set_value(
            convert_camel_case_name_to_snake_case_name(
                PipelineRunRngStateOutput.__name__
            ),
            PipelineRunRngStateOutput(rng.bit_generator.state),
        )

        for step in self.steps:
            step_input = self.build_input(state, step.get_input_cls())
            step_output = step.run(step_input, rng)
            step_output_cls = step.get_output_cls()
            assert isinstance(step_output, step_output_cls)
            state.set_value(
                convert_camel_case_name_to_snake_case_name(step_output_cls.__name__),
                step_output,
            )

        return self.post_processor.generate_output(
            self.build_input(state, self.post_processor.get_input_cls()),
            rng,
        )
