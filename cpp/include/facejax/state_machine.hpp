// Camera/registration state machine.
//
// Native rebuild of the reference's SystemState flow (CameraSettings.h:5-23,
// SURVEY.md C22): Identification -> EnterName -> Downcount -> RegImageAcq ->
// SelRegImage -> InputName -> Registration -> RegistFeature -> back to
// Identification. The reference ships only the enum + globals (the GUI app
// is out-of-repo); here the transition table is explicit and testable.

#pragma once

#include <string>

namespace facejax {

enum class SystemState {
  kIdentification = 0,
  kEnterName,
  kDowncount,
  kRegImageAcq,
  kSelRegImage,
  kInputName,
  kRegistration,
  kRegistFeature,
};

enum class Event {
  kStartRegistration = 0,  // user requests enrollment
  kNameEntered,
  kCountdownDone,
  kImagesAcquired,
  kImagesSelected,
  kDetailsEntered,
  kFeatureStored,
  kCancel,
  kTick,
};

class RegistrationStateMachine {
 public:
  SystemState state() const { return state_; }

  // Returns true when the event caused a transition.
  bool Handle(Event e) {
    SystemState next = state_;
    if (e == Event::kCancel) {
      next = SystemState::kIdentification;
    } else {
      switch (state_) {
        case SystemState::kIdentification:
          if (e == Event::kStartRegistration) next = SystemState::kEnterName;
          break;
        case SystemState::kEnterName:
          if (e == Event::kNameEntered) next = SystemState::kDowncount;
          break;
        case SystemState::kDowncount:
          if (e == Event::kCountdownDone) next = SystemState::kRegImageAcq;
          break;
        case SystemState::kRegImageAcq:
          if (e == Event::kImagesAcquired) next = SystemState::kSelRegImage;
          break;
        case SystemState::kSelRegImage:
          if (e == Event::kImagesSelected) next = SystemState::kInputName;
          break;
        case SystemState::kInputName:
          if (e == Event::kDetailsEntered) next = SystemState::kRegistration;
          break;
        case SystemState::kRegistration:
          if (e == Event::kFeatureStored) next = SystemState::kRegistFeature;
          break;
        case SystemState::kRegistFeature:
          if (e == Event::kTick) next = SystemState::kIdentification;
          break;
      }
    }
    bool changed = next != state_;
    state_ = next;
    return changed;
  }

 private:
  SystemState state_ = SystemState::kIdentification;
};

}  // namespace facejax
